"""DIMCH: dynamic-instance multi-concept hashing over token sets.

Re-implementation of /root/reference/models/DIMCH/{DIMCH.py,hash/hash.py,
distance/distance.py,loss/triplet_loss.py}. Per modality the CLIP token
sequence ([cls]+patches for images, all text tokens) becomes ``setDim``
"instances" via a Conv1d that mixes tokens (channels = tokens, spatial =
embed dim — reference hash.py:23), then an MLP hashes each instance; the
per-item hash is the tanh/softmax of the instance mean (MeanHashing inside
the Hash wrapper, hash.py:7-16,44-52).

Loss (reference DIMCH.py:149-234): set-wise (smooth-)chamfer similarity →
DCG-weighted triplet on the token sets, MMD(RBF) cross-modal alignment,
batchwise uniformity (diversity), plus a triplet + quantization pair on the
merged hashes. ``from_config`` doubles output_dim for the softmax hash
(DIMCH.py:97-98).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.distances import (
    batchwise_uniformity_loss,
    cos_distance,
    mmd_rbf_loss,
    setwise_similarity,
    weighted_triplet_loss,
)
from ..ops.hashing import kaiming_uniform_fan_out, softmax_hash
from ..config import EmptyConfig
from ..registry import registry
from .base import BaseHashModel, Method, resolve_clip_cfg
from .clip.model import CLIP, CLIPConfig
from .dcmht import soft_argmax_hash_loss


def _kaiming_normal_fan_in(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(a=0, mode='fan_in') for conv kernels
    (reference weights_init_kaiming, models/common/hash.py:11-14)."""
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class TokenHash(nn.Module):
    """Conv1d token→instance mixer + per-instance hash MLP
    (reference hash/hash.py:18-52)."""

    input_tokens: int
    output_dim: int
    embed_dim: int
    set_dim: int
    dropout: float = 0.3
    hash_func: str = "tanh"

    @nn.compact
    def __call__(self, tokens: jax.Array, train: bool = True):
        # tokens: (B, T, D). torch Conv1d treats tokens as channels and the
        # embedding dim as the spatial axis; flax convolves the middle axis,
        # so present (B, D, T) and map T→setDim.
        x = tokens.astype(jnp.float32).transpose(0, 2, 1)      # (B, D, T)
        x = nn.Conv(
            features=self.set_dim, kernel_size=(3,), padding="SAME",
            kernel_init=_kaiming_normal_fan_in, bias_init=nn.initializers.zeros,
            name="token_layer",
        )(x)                                                    # (B, D, M)
        x = jax.nn.relu(x).transpose(0, 2, 1)                   # (B, M, D)
        x = nn.Dense(self.embed_dim // 2,
                     kernel_init=kaiming_uniform_fan_out,
                     bias_init=nn.initializers.zeros, name="fc1")(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train, name="drop")(x)
        embeds = nn.Dense(self.output_dim,
                          kernel_init=kaiming_uniform_fan_out,
                          bias_init=nn.initializers.zeros, name="fc2")(x)
        merged = jnp.mean(embeds, axis=1)                       # MeanHashing
        if self.hash_func == "softmax":
            hashed = softmax_hash(merged)
        else:
            hashed = jnp.tanh(merged)
        return embeds, hashed


class DIMCHModel(BaseHashModel):
    clip_cfg: CLIPConfig
    output_dim: int = 16          # doubled already when hash_func=softmax
    set_dim: int = 8
    txt_token_size: int = 32
    dropout: float = 0.3
    hash_func: str = "tanh"
    # the reference NEVER passes key_padding_mask through DIMCH — its train
    # loop and eval both call model(image, text) (runners/DIMCH/runner.py:
    # 132,148), so padding-position tokens enter the text token set. Default
    # matches the reference for parity; set model.mask_padding: true in the
    # config for the (arguably more sensible) masked variant.
    mask_padding: bool = False

    def setup(self):
        self.backbone = CLIP(self.clip_cfg)
        d = self.clip_cfg.embed_dim
        visual_tokens = self.clip_cfg.num_patches + 1  # [cls] + patches
        self.img_token_hash = TokenHash(
            visual_tokens, self.output_dim, d, self.set_dim, self.dropout,
            self.hash_func, name="hash_img",
        )
        self.txt_token_hash = TokenHash(
            self.txt_token_size, self.output_dim, d, self.set_dim, self.dropout,
            self.hash_func, name="hash_txt",
        )

    def _image_tokens(self, image):
        cls_token, seq_tokens, _ = self.backbone.encode_image(image)
        return jnp.concatenate([cls_token[:, None, :], seq_tokens], axis=1)

    def encode_image(self, image, train: bool = True, with_embeds: bool = False):
        embeds, hashed = self.img_token_hash(self._image_tokens(image),
                                             train=train)
        return (embeds, hashed) if with_embeds else hashed

    def encode_text(self, text, key_padding_mask=None, train: bool = True,
                    with_embeds: bool = False):
        kpm = key_padding_mask if self.mask_padding else None
        _, tokens, _, _ = self.backbone.encode_text(text, kpm)
        embeds, hashed = self.txt_token_hash(tokens, train=train)
        return (embeds, hashed) if with_embeds else hashed

    def __call__(self, image, text, key_padding_mask=None, train: bool = True):
        img_embeds, img_hash = self.encode_image(image, train=train,
                                                 with_embeds=True)
        txt_embeds, txt_hash = self.encode_text(text, key_padding_mask,
                                                train=train, with_embeds=True)
        return img_embeds, img_hash, txt_embeds, txt_hash


def tanh_hash_loss(code: jax.Array) -> jax.Array:
    """MSE to the detached sign (reference DIMCH.py:131-134)."""
    target = jnp.sign(jax.lax.stop_gradient(code))
    return jnp.mean((code - target) ** 2)


def dimch_loss_fn(*, set_dim, hash_func, distance_cfg, chamfer_cfg, hash_cfg):
    mode = distance_cfg.get("mode", "chamfer")
    denominator = distance_cfg.get("denominator", 2.0)
    temperature = distance_cfg.get("temperature", 16.0)
    temperature_txt_scale = distance_cfg.get("temperature_txt_scale", 1.0)
    mmd_alpha = chamfer_cfg.get("mmd_alpha", 0.01)
    unif_alpha = chamfer_cfg.get("unif_alpha", 0.01)
    mmd_gamma = chamfer_cfg.get("mmd_gamma", 0.5)
    token_margin = chamfer_cfg.get("token_triplet_margin", 0.2)
    triplet_alpha = hash_cfg.get("triplet_alpha", 1.0)
    quan_alpha = hash_cfg.get("quan_alpha", 0.001)
    hash_triplet_alpha = hash_cfg.get("hash_triplet_alpha", 0.5)
    triplet_margin = hash_cfg.get("triplet_margin", 0.3)

    def loss(outputs, batch, method_state, step):
        img_embeds, img_hash, txt_embeds, txt_hash = outputs
        labels = batch["label"]

        norm = lambda x: x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8
        )
        img_n, txt_n = norm(img_embeds), norm(txt_embeds)

        kw = dict(mode=mode, denominator=denominator, temperature=temperature,
                  temperature_txt_scale=temperature_txt_scale)
        i2t_sim = setwise_similarity(img_n, txt_n, **kw)
        t2i_sim = setwise_similarity(txt_n, img_n, **kw)
        tokens_i2t = weighted_triplet_loss(
            jnp.maximum(1.0 - i2t_sim, 0.0), labels, margin=token_margin
        )
        tokens_t2i = weighted_triplet_loss(
            jnp.maximum(1.0 - t2i_sim, 0.0), labels, margin=token_margin
        )

        flat_i = img_n.reshape(-1, img_n.shape[-1])
        flat_t = txt_n.reshape(-1, txt_n.shape[-1])
        mmd = mmd_rbf_loss(flat_i, flat_t, gamma=mmd_gamma)
        div = (batchwise_uniformity_loss(img_n, set_dim)
               + batchwise_uniformity_loss(txt_n, set_dim))

        total = ((tokens_i2t + tokens_t2i) / 2.0 * triplet_alpha
                 + mmd_alpha * mmd + unif_alpha * div)

        hash_i2t = weighted_triplet_loss(
            cos_distance(img_hash, txt_hash), labels, margin=triplet_margin
        )
        hash_t2i = weighted_triplet_loss(
            cos_distance(txt_hash, img_hash), labels, margin=triplet_margin
        )
        if hash_func == "softmax":
            quan_i = soft_argmax_hash_loss(img_hash)
            quan_t = soft_argmax_hash_loss(txt_hash)
        else:
            quan_i = tanh_hash_loss(img_hash)
            quan_t = tanh_hash_loss(txt_hash)

        total = (total + (hash_i2t + hash_t2i) / 2.0 * hash_triplet_alpha
                 + (quan_i + quan_t) / 2.0 * quan_alpha)

        loss_dict = {
            "All loss": total,
            "Tokens": {
                "Similarity": {"i2t": tokens_i2t, "t2i": tokens_t2i},
                "Maximum Mean Discrepancy": mmd,
                "Diversity": div,
            },
            "Hash": {
                "Triplet": {"i2t": hash_i2t, "t2i": hash_t2i},
                "Quantization": {"image": quan_i, "text": quan_t},
            },
        }
        return total, loss_dict, method_state

    return loss


@registry.register_model("DIMCH")
class DIMCHMethod(Method):
    arch = "DIMCH"
    code_mode = "sign"

    @classmethod
    def from_config(cls, cfg_model, output_dim: int = 16, train_num: int = 10000,
                    clip_cfg: Optional[CLIPConfig] = None) -> "DIMCHMethod":
        clip_cfg = resolve_clip_cfg(cfg_model, clip_cfg)
        g = (lambda k, d: cfg_model.get(k, d)) if cfg_model else (lambda k, d: d)
        # defaults mirror the reference signature (DIMCH.py:25-27):
        # setDim=64, hash_func="softmax" — a config omitting these must
        # build the same model the reference would
        hash_func = g("hash_func", "softmax")
        set_dim = g("setDim", 64)
        if "softmax" in hash_func:
            output_dim *= 2  # reference DIMCH.py:97-98

        def section(name):
            sec = cfg_model.get(name, None) if cfg_model else None
            return sec if sec is not None else EmptyConfig()

        module = DIMCHModel(
            clip_cfg=clip_cfg,
            output_dim=output_dim,
            set_dim=set_dim,
            txt_token_size=g("txt_token_size", 32),
            dropout=g("dropout", 0.3),
            hash_func=hash_func,
            mask_padding=g("mask_padding", False),
        )
        loss = dimch_loss_fn(
            set_dim=set_dim, hash_func=hash_func,
            distance_cfg=section("distance"), chamfer_cfg=section("chamfer"),
            hash_cfg=section("hash_pars"),
        )
        return cls(module=module, loss=loss, cfg_model=cfg_model,
                   train_num=train_num)

