"""Baseline: two 2-layer MLP heads + symmetric Bayesian pairwise loss.

Re-implementation of /root/reference/models/baseline/model.py: per-modality
head = Linear(d→d/2) → relu → dropout → Linear(d/2→K) → tanh (kaiming-uniform
fan_out init, zero bias); loss = symmetric Bayesian likelihood on the
½·codeᵀcode similarities plus tanh quantization MSE weighted by quan_alpha
(model.py:118-152).

Intended-behavior fixes over the reference (documented, SURVEY.md §7):
``load_backbone`` is unpacked as ``(state_dict, backbone)`` and then indexed
(model.py:87-88 — works only by accident) and ``encode_txt`` routes text
through the image head (model.py:60); here text uses its own head.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.hashing import kaiming_uniform_fan_out
from ..registry import registry
from .base import BaseHashModel, Method, resolve_clip_cfg
from .clip.model import CLIP, CLIPConfig
from .dimch import tanh_hash_loss
from .mith import bayesian_loss as _bayes
from ..ops.metrics import calc_label_sim


class MLPHash(nn.Module):
    output_dim: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        d = x.shape[-1]
        x = nn.Dense(d // 2, kernel_init=kaiming_uniform_fan_out,
                     bias_init=nn.initializers.zeros, name="fc1")(
            x.astype(jnp.float32))
        x = jax.nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train, name="drop")(x)
        x = nn.Dense(self.output_dim, kernel_init=kaiming_uniform_fan_out,
                     bias_init=nn.initializers.zeros, name="fc2")(x)
        return jnp.tanh(x)


class BaselineModel(BaseHashModel):
    clip_cfg: CLIPConfig
    output_dim: int = 16
    dropout: float = 0.3

    def setup(self):
        self.backbone = CLIP(self.clip_cfg)
        self.img_hash = MLPHash(self.output_dim, self.dropout, name="hash_img")
        self.txt_hash = MLPHash(self.output_dim, self.dropout, name="hash_txt")

    def encode_image(self, image, train: bool = True):
        cls_token, _, _ = self.backbone.encode_image(image)
        return self.img_hash(cls_token.astype(jnp.float32), train=train)

    def encode_text(self, text, key_padding_mask=None, train: bool = True):
        eos_token, _, _, _ = self.backbone.encode_text(text, key_padding_mask)
        return self.txt_hash(eos_token.astype(jnp.float32), train=train)


def baseline_loss_fn(*, quan_alpha: float):
    def loss(outputs, batch, method_state, step):
        img_hash, txt_hash = outputs
        label_sim = calc_label_sim(batch["label"], batch["label"])
        b_ab = _bayes(img_hash, txt_hash, label_sim)
        b_ba = _bayes(txt_hash, img_hash, label_sim)
        quan_i = tanh_hash_loss(img_hash)
        quan_t = tanh_hash_loss(txt_hash)
        total = (b_ab + b_ba) / 2.0 + quan_alpha * (quan_t + quan_i) / 2.0
        loss_dict = {
            "All loss": total,
            "Bayesian": {"i2t": b_ab, "t2i": b_ba},
            "Quan": {"Image": quan_i, "Text": quan_t},
        }
        return total, loss_dict, method_state

    return loss


@registry.register_model("Baseline")
class BaselineMethod(Method):
    arch = "Baseline"
    code_mode = "sign"

    @classmethod
    def from_config(cls, cfg_model, output_dim: int = 16, train_num: int = 10000,
                    clip_cfg: Optional[CLIPConfig] = None) -> "BaselineMethod":
        clip_cfg = resolve_clip_cfg(cfg_model, clip_cfg)
        quan_alpha = cfg_model.get("quan_alpha", 0.001) if cfg_model else 0.001
        dropout = cfg_model.get("dropout", 0.3) if cfg_model else 0.3
        module = BaselineModel(clip_cfg=clip_cfg, output_dim=output_dim,
                               dropout=dropout)
        return cls(module=module, loss=baseline_loss_fn(quan_alpha=quan_alpha),
                   cfg_model=cfg_model, train_num=train_num)
