"""Baseline trainer (reference /root/reference/runners/baseline/runner.py):
the generic pairwise loop; sign binarization; hash_scale 1. The reference's
optimizer groups reference ``model.clip`` while the model names it
``backbone`` (runner.py:126 — a latent break); our param partition keys off
the actual ``backbone`` subtree."""

from __future__ import annotations

from ..registry import registry
from .base import BaseTrainer


@registry.register_runner("BaselineTrainer")
class BaselineTrainer(BaseTrainer):
    def __init__(self, cfg, **kwargs):
        self.hash_func = cfg.model.get("hash_func", "tanh")
        self.hash_scale = 1
        super().__init__(cfg, **kwargs)
