"""MITH trainer (reference /root/reference/runners/MITH/runner.py).

The memory-bank label similarity (train_labels × batch) and the summed
cls+token eval hash are wired inside the method itself; this subclass pins
the tanh contract."""

from __future__ import annotations

from ..registry import registry
from .base import BaseTrainer


@registry.register_runner("MITHTrainer")
class MITHTrainer(BaseTrainer):
    def __init__(self, cfg, **kwargs):
        self.hash_func = cfg.model.get("hash_func", "tanh")
        assert self.hash_func == "tanh", "MITH must adopt the 'tanh' hash technique."
        self.hash_scale = 1
        super().__init__(cfg, **kwargs)
