"""DCMHT: differentiable cross-modal hashing with softmax-pair codes.

Re-implementation of /root/reference/models/DCMHT/{DCMHT.py,hash/hash.py}:
per-modality head = single-token attention → norm (BatchNorm for image,
LayerNorm for text) → Dense(embed→2K) → relu → softmax over (hi,lo) pairs;
loss = clipped euclidean (or cosine-BCE) similarity over intra (i↔t) and
inter (i↔i, t↔t) pairs + soft-argmax quantization ``1 - mean((2c-1)²)``.
Eval code = pair-argmax → ±1 (runners/DCMHT/runner.py:82-95).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.hashing import softmax_hash, tanh_hash
from ..ops.metrics import calc_label_sim, cosine_similarity, euclidean_similarity
from ..registry import registry
from .base import BaseHashModel, Method, resolve_clip_cfg
from .clip.model import CLIP, CLIPConfig
from .common import BatchNorm1d, SingleTokenAttention, kaiming_dense


class ModalityHash(nn.Module):
    """One modality's projection head (reference hash/hash.py:15-55)."""

    input_dim: int
    output_dim: int
    layernorm: bool = True  # text: LayerNorm; image: BatchNorm
    hash_func: str = "softmax"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = SingleTokenAttention(self.input_dim, name="atten")(x)
        if self.layernorm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
                x.astype(jnp.float32)
            )
        else:
            x = BatchNorm1d(self.input_dim, name="norm")(x, train=train)
        x = kaiming_dense(self.output_dim * 2, name="fc2")(x)
        x = jax.nn.relu(x)
        if self.hash_func == "softmax":
            return softmax_hash(x)
        return tanh_hash(x)


class DCMHTModel(BaseHashModel):
    clip_cfg: CLIPConfig
    output_dim: int = 16
    hash_func: str = "softmax"

    def setup(self):
        self.backbone = CLIP(self.clip_cfg)
        embed = self.clip_cfg.embed_dim
        self.img_hash = ModalityHash(
            embed, self.output_dim, layernorm=False, hash_func=self.hash_func,
            name="hash_img",
        )
        self.txt_hash = ModalityHash(
            embed, self.output_dim, layernorm=True, hash_func=self.hash_func,
            name="hash_txt",
        )

    def encode_image(self, image, train: bool = True):
        cls_token, _, _ = self.backbone.encode_image(image)
        return self.img_hash(cls_token.astype(jnp.float32), train=train)

    def encode_text(self, text, key_padding_mask=None, train: bool = True):
        eos_token, _, _, _ = self.backbone.encode_text(text, key_padding_mask)
        return self.txt_hash(eos_token.astype(jnp.float32), train=train)


def _similarity_loss(a, b, label_sim, *, output_dim, vartheta, threshold,
                     similarity_function):
    """Reference DCMHT.similarity_loss (DCMHT.py:72-103)."""
    if similarity_function == "cosine":
        sim = cosine_similarity(a, b)
        sim = jnp.clip(sim, threshold, 1.0 - threshold)
        sim_loss = -label_sim * jnp.log(sim) - (1.0 - label_sim) * jnp.log(1.0 - sim)
        m = jnp.mean(sim_loss)
        return m, m
    sim = euclidean_similarity(a, b)
    positive = sim * label_sim
    max_value = float(output_dim * 2 * vartheta) ** 0.5
    negative = jnp.clip(sim * (1.0 - label_sim), max=max_value)
    negative = max_value * (1.0 - label_sim) - negative
    return jnp.mean(positive**2), jnp.mean(negative**2)


def soft_argmax_hash_loss(code: jax.Array) -> jax.Array:
    """Quantization: 1 - mean((2c-1)²) over pair probabilities
    (reference DCMHT.py:105-110)."""
    return 1.0 - jnp.mean((2.0 * code - 1.0) ** 2)


def dcmht_loss_fn(*, output_dim, vartheta=0.75, threshold=0.1,
                  quan_alpha=0.001, similarity_function="euclidean"):
    """Build the pure DCMHT loss (reference our_loss, DCMHT.py:112-147)."""

    def loss(outputs, batch, method_state, step):
        img_hash, txt_hash = outputs
        labels = batch["label"]
        label_sim = calc_label_sim(labels, labels)
        kw = dict(output_dim=output_dim, vartheta=vartheta, threshold=threshold,
                  similarity_function=similarity_function)
        intra_p, intra_n = _similarity_loss(img_hash, txt_hash, label_sim, **kw)
        inter_pi, inter_ni = _similarity_loss(img_hash, img_hash, label_sim, **kw)
        inter_pt, inter_nt = _similarity_loss(txt_hash, txt_hash, label_sim, **kw)

        quan_img = soft_argmax_hash_loss(img_hash)
        quan_txt = soft_argmax_hash_loss(txt_hash)

        similarity_loss = (intra_p + intra_n) + (inter_pt + inter_pi + inter_ni + inter_nt)
        quan_loss = (quan_img + quan_txt) / 2.0
        total = similarity_loss + quan_alpha * quan_loss

        loss_dict = {
            "All loss": total,
            "Intra": {"Positive": intra_p, "Negative": intra_n},
            "Inter": {
                "Positive": {"i2t": inter_pi, "t2i": inter_pt},
                "Negative": {"i2t": inter_ni, "t2i": inter_nt},
            },
            "Quan": {"Image": quan_img, "Text": quan_txt},
        }
        return total, loss_dict, method_state

    return loss


@registry.register_model("DCMHT")
class DCMHTMethod(Method):
    arch = "DCMHT"
    code_mode = "pair_argmax"

    @classmethod
    def from_config(cls, cfg_model, output_dim: int = 16, train_num: int = 10000,
                    clip_cfg: Optional[CLIPConfig] = None) -> "DCMHTMethod":
        clip_cfg = resolve_clip_cfg(cfg_model, clip_cfg)
        hash_func = cfg_model.get("hash_func", "softmax") if cfg_model else "softmax"
        module = DCMHTModel(
            clip_cfg=clip_cfg, output_dim=output_dim, hash_func=hash_func
        )
        loss = dcmht_loss_fn(
            output_dim=output_dim,
            vartheta=cfg_model.get("vartheta", 0.75) if cfg_model else 0.75,
            threshold=cfg_model.get("threshold", 0.1) if cfg_model else 0.1,
            quan_alpha=cfg_model.get("quan_alpha", 0.001) if cfg_model else 0.001,
            similarity_function=(
                cfg_model.get("similarity_function", "euclidean")
                if cfg_model
                else "euclidean"
            ),
        )
        return cls(module=module, loss=loss, cfg_model=cfg_model, train_num=train_num)
