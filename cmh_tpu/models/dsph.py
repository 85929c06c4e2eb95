"""DSPH: deep semantic-preserving hashing with learnable class proxies.

Re-implementation of /root/reference/models/DSPH/{DSPH.py,hash/hash.py,
loss/HyP.py}: per-modality head = Linear → dropout(0.2) → tanh; loss = HyP
proxy loss — cosine of codes against L2-normalized learnable class proxies,
pull (1 - cos) on positive classes, push relu(cos - threshold) on negatives,
for both modalities, plus an optional α-weighted multi-label regularizer
over x/t/xt similarities of multi-label samples. The margin threshold is
looked up from the (code-length × ⌈log₂ classes⌉) table the reference ships
as ``loss/codetable.xlsx`` (DSPH.py:32-35) — embedded here as JSON (no xlsx
reader in this environment; values extracted from the same workbook).

The proxies live in the param tree under top-level key ``proxies`` and are
trained by a separate SGD(momentum, weight_decay) transform, mirroring the
reference's second optimizer (runners/DSPH/runner.py:83-127).
"""

from __future__ import annotations

import json
import math
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import registry
from .base import BaseHashModel, Method, resolve_clip_cfg
from .clip.model import CLIP, CLIPConfig

_CODETABLE_PATH = os.path.join(os.path.dirname(__file__), "dsph_codetable.json")


def lookup_threshold(output_dim: int, numclass: int) -> float:
    """threshold = codetable[output_dim][ceil(log2 numclass)]
    (reference DSPH.py:33-35)."""
    with open(_CODETABLE_PATH) as f:
        table = json.load(f)
    row = table[str(output_dim)]
    col = math.ceil(math.log(numclass, 2))
    value = row[col]
    assert value is not None, (
        f"codetable has no entry for {output_dim} bits / {numclass} classes"
    )
    return float(value)


class LinearHash(nn.Module):
    """Linear → dropout → tanh (reference DSPH hash/hash.py:6-15)."""

    output_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = x.astype(jnp.float32)
        # plain nn.Linear in the reference → torch DEFAULT init (kernel and
        # bias uniform ±1/√fan_in), not flax's lecun_normal + zero bias
        from .common import torch_default_dense

        x = torch_default_dense(self.output_dim, x.shape[-1], name="fc")(x)
        x = nn.Dropout(rate=self.dropout, deterministic=not train, name="drop")(x)
        return jnp.tanh(x)


class DSPHModel(BaseHashModel):
    clip_cfg: CLIPConfig
    output_dim: int = 16
    numclass: int = 80
    proxy_init_seed: int = 0
    dropout: float = 0.2  # reference LinearHash fixes p=0.2 (hash/hash.py:11)

    def setup(self):
        self.backbone = CLIP(self.clip_cfg)
        self.img_hash = LinearHash(self.output_dim, dropout=self.dropout,
                                   name="hash_img")
        self.txt_hash = LinearHash(self.output_dim, dropout=self.dropout,
                                   name="hash_txt")
        # kaiming-normal(fan_out) proxies with the reference's torch seed
        # discipline replaced by the framework PRNG (HyP.py:11-16). torch
        # fan_out of the (numclass, output_dim) matrix is shape[0] =
        # numclass → std = √(2/numclass), NOT √(2/output_dim); the loss is
        # scale-invariant (proxies are normalized) but the separate SGD's
        # weight decay and through-normalization gradients are not
        self.proxies = self.param(
            "proxies",
            lambda key, shape: jax.random.normal(key, shape)
            * (2.0 / shape[0]) ** 0.5,
            (self.numclass, self.output_dim),
        )

    def encode_image(self, image, train: bool = True):
        cls_token, _, _ = self.backbone.encode_image(image)
        return self.img_hash(cls_token.astype(jnp.float32), train=train)

    def encode_text(self, text, key_padding_mask=None, train: bool = True):
        eos_token, _, _, _ = self.backbone.encode_text(text, key_padding_mask)
        return self.txt_hash(eos_token.astype(jnp.float32), train=train)

    def __call__(self, image, text, key_padding_mask=None, train: bool = True):
        img = self.encode_image(image, train=train)
        txt = self.encode_text(text, key_padding_mask, train=train)
        return img, txt, self.proxies


def _norm(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def hyp_loss(img, txt, proxies, labels, *, threshold: float, alpha: float):
    """Reference HyP.forward (loss/HyP.py:18-69), fully vectorized.

    The reference's dynamic multi-label subset (``label.sum(1) > 1``) becomes
    a mask — XLA needs static shapes, and masked sums over the full batch are
    numerically identical.
    """
    p = labels  # (B, C) one/multi-hot
    proxies_n = _norm(proxies)
    xn, tn = _norm(img), _norm(txt)

    cos = xn @ proxies_n.T
    cos_t = tn @ proxies_n.T
    pos, neg = 1.0 - cos, jax.nn.relu(cos - threshold)
    pos_t, neg_t = 1.0 - cos_t, jax.nn.relu(cos_t - threshold)

    p_num = jnp.maximum(jnp.sum(p == 1), 1)
    n_num = jnp.maximum(jnp.sum(p == 0), 1)
    pos_term = jnp.sum(jnp.where(p == 1, pos, 0.0)) / p_num
    neg_term = jnp.sum(jnp.where(p == 0, neg, 0.0)) / n_num
    pos_term_t = jnp.sum(jnp.where(p == 1, pos_t, 0.0)) / p_num
    neg_term_t = jnp.sum(jnp.where(p == 0, neg_t, 0.0)) / n_num

    total = pos_term + neg_term + pos_term_t + neg_term_t

    if alpha > 0:
        multi = (labels.sum(axis=1) > 1).astype(jnp.float32)  # (B,)
        pair_mask = multi[:, None] * multi[None, :]
        cos_sim = labels @ labels.T
        zero_mask = pair_mask * (cos_sim == 0)
        denom = jnp.sum(zero_mask)

        x_sim = xn @ xn.T
        t_sim = tn @ tn.T
        xt_sim = xn @ tn.T
        safe = jnp.maximum(denom, 1.0)
        reg = jnp.sum(zero_mask * alpha * jax.nn.relu(x_sim - threshold)) / safe
        reg_t = jnp.sum(zero_mask * alpha * jax.nn.relu(t_sim - threshold)) / safe
        reg_xt = jnp.sum(zero_mask * alpha * jax.nn.relu(xt_sim - threshold)) / safe
        has_pairs = (denom > 0).astype(jnp.float32)
        total = total + has_pairs * (reg + reg_t + reg_xt)

    return total


def dsph_loss_fn(*, threshold: float, alpha: float):
    def loss(outputs, batch, method_state, step):
        img, txt, proxies = outputs
        total = hyp_loss(
            img, txt, proxies, batch["label"], threshold=threshold, alpha=alpha
        )
        return total, {"All loss": total}, method_state

    return loss


@registry.register_model("DSPH")
class DSPHMethod(Method):
    arch = "DSPH"
    code_mode = "sign"

    @classmethod
    def from_config(cls, cfg_model, output_dim: int = 16, train_num: int = 10000,
                    clip_cfg: Optional[CLIPConfig] = None) -> "DSPHMethod":
        clip_cfg = resolve_clip_cfg(cfg_model, clip_cfg)
        numclass = cfg_model.get("numclass", 80) if cfg_model else 80
        alpha = cfg_model.get("alpha", 0.8) if cfg_model else 0.8
        threshold = lookup_threshold(output_dim, numclass)
        module = DSPHModel(
            clip_cfg=clip_cfg, output_dim=output_dim, numclass=numclass,
            dropout=cfg_model.get("dropout", 0.2) if cfg_model else 0.2,
        )
        loss = dsph_loss_fn(threshold=threshold, alpha=alpha)
        return cls(module=module, loss=loss, cfg_model=cfg_model, train_num=train_num)

    def init_variables(self, rng, sample_batch):
        # dropout needs an rng collection at init; deterministic at eval
        return self.module.init(
            {"params": rng},
            jnp.asarray(sample_batch["image"]),
            jnp.asarray(sample_batch["text"]),
            jnp.asarray(sample_batch["key_padding_mask"]),
            train=False,
        )
