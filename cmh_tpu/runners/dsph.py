"""DSPH trainer (reference /root/reference/runners/DSPH/runner.py:9-128).

Adds the second optimizer for the HyP class proxies: SGD with momentum and
coupled weight decay, applied to the ``proxies`` param-tree key while
everything else stays on BertAdam — both updates fuse into the single jitted
train step (the reference steps two torch optimizers back to back,
runner.py:121-125).
"""

from __future__ import annotations

import optax

from ..registry import registry
from .base import BaseTrainer


@registry.register_runner("DSPHTrainer")
class DSPHTrainer(BaseTrainer):
    def __init__(self, cfg, **kwargs):
        self.hash_func = cfg.model.get("hash_func", "tanh")
        assert self.hash_func == "tanh", "DSPH must adopt the 'tanh' hash technique."
        self.hash_scale = 1
        super().__init__(cfg, **kwargs)

    def extra_optimizers(self, cfg_optimizer):
        hyp = cfg_optimizer.get("hyp", None)
        lr = hyp.get("lr", 0.02) if hyp else 0.02
        momentum = hyp.get("momentum", 0.9) if hyp else 0.9
        weight_decay = hyp.get("weight_decay", 0.0005) if hyp else 0.0005
        # torch SGD couples weight decay into the gradient before the
        # momentum buffer — add_decayed_weights before the trace matches
        proxy_tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate=lr, momentum=momentum),
        )
        return {"proxies": proxy_tx}
