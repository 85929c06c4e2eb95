"""DNPH trainer (reference /root/reference/runners/DNPH/runner.py:9-141):
plain SGD for the proxy parameters, BertAdam for everything else; eval hash
drops the class predictions (generate_hash, runner.py:138-141) — our
``encode_image``/``encode_text`` already return only the hash."""

from __future__ import annotations

import optax

from ..registry import registry
from .base import BaseTrainer


@registry.register_runner("DNPHTrainer")
class DNPHTrainer(BaseTrainer):
    def __init__(self, cfg, **kwargs):
        self.hash_func = cfg.model.get("hash_func", "tanh")
        assert self.hash_func == "tanh", "DNPH must adopt the 'tanh' hash technique."
        self.hash_scale = 1
        super().__init__(cfg, **kwargs)

    def extra_optimizers(self, cfg_optimizer):
        loss_cfg = cfg_optimizer.get("loss", None)
        lr = loss_cfg.get("lr", 0.0001) if loss_cfg else 0.0001
        return {"proxies": optax.sgd(learning_rate=lr)}
