"""DIMCH trainer (reference /root/reference/runners/DIMCH/runner.py):
injects the dataset's max_word as the text token count into the model
config (runner.py:87-107); eval code = merged per-token hash, sign-binarized
by the base path."""

from __future__ import annotations

from ..registry import registry
from .base import BaseTrainer


@registry.register_runner("DIMCHTrainer")
class DIMCHTrainer(BaseTrainer):
    def __init__(self, cfg, **kwargs):
        self.hash_func = cfg.model.get("hash_func", "tanh")
        self.hash_scale = 2 if self.hash_func == "softmax" else 1
        # the reference passes txt_token_size = dataset max_word into
        # build_model (runner.py:87); route it through the model config
        cfg.model.update({"txt_token_size": cfg.dataset.get("max_word", 32)})
        super().__init__(cfg, **kwargs)
