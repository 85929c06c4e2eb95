"""DCMHT trainer (reference /root/reference/runners/DCMHT/runner.py:6-130).

The generic BaseTrainer already covers the canonical loop; this subclass
pins the method contract: softmax hash required, pair-argmax binarization
(hash_scale=2), and the loss display wiring.
"""

from __future__ import annotations

from ..registry import registry
from .base import BaseTrainer


@registry.register_runner("DCMHTTrainer")
class DCMHTTrainer(BaseTrainer):
    def __init__(self, cfg, **kwargs):
        self.hash_func = cfg.model.get("hash_func", "softmax")
        assert self.hash_func == "softmax", (
            "DCMHT must adopt the 'softmax' hash technique."
        )
        self.hash_scale = 2
        super().__init__(cfg, **kwargs)
