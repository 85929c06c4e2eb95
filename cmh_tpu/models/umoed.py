"""UMoED: unified MoE decoder hashing with generative code slots.

Re-implementation of /root/reference/models/UMoED/{UMoED.py,hash/hash_moe.py,
hash/block/SoftMoe.py,hash/block/transformer.py,distance/__init__.py}:

- ``setDim`` learned query slots cross-attend to the fused modality token
  sequence through a (optionally Soft-MoE) TransformerDecoder; a classifier
  maps each slot to ``vocab = 2^(outputDim/setDim)`` logits (hash_moe.py:
  22-60, vocab calc UMoED.py:57-58). With ``fusion=True`` one decoder head
  is shared by both modalities (hash_moe.py:102-111).
- Soft-MoE (SoftMoe.py:100-205): dispatch softmax over the sequence,
  combine softmax over all (expert, slot) pairs, experts as ONE batched
  einsum — already the TPU-native formulation; the reference notes torch
  cannot even softmax over two axes at once.
- ``linear_subspace`` hashing: per-slot argmax → ±1 codeword table gather.
- Loss (UMoED.py:249-347): pairwise/extreme-softmax set distance (or the
  chamfer family) → DCG-weighted triplet (or Bayesian likelihood when
  ``triplet=False``) + batchwise diversity. No quantization term.

Deviation (intended-behavior fix): in non-fusion mode the reference routes
text through the image head (hash_moe.py:133-139); here text uses its own.
``model.compat_nonfusion_txt_via_img: true`` restores the reference routing
for bit-level parity runs.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.distances import (
    batchwise_uniformity_loss_per_sample,
    setwise_similarity,
    weighted_triplet_loss,
)
from ..ops.hashing import linear_subspace_hash, softmax_hash, tanh_hash
from ..ops.metrics import calc_label_sim
from ..config import EmptyConfig
from ..registry import registry
from .base import BaseHashModel, Method, resolve_clip_cfg
from .clip.model import CLIP, CLIPConfig, LayerNormFp32, MultiHeadAttention


def _torch_fan_in(shape) -> int:
    """torch _calculate_fan_in_and_fan_out: fan_in = shape[1] × receptive
    field (prod of dims 2+). For the stacked 3-D SoftMoE tensors this is
    NOT just shape[1]: expert weight (n, d_in, d_out) → d_in·d_out and
    phi (d, n, p) → n·p (SoftMoe.py:53-60)."""
    if len(shape) < 2:
        return shape[0] if shape else 1
    fan = shape[1]
    for d in shape[2:]:
        fan *= d
    return fan


def _kaiming_a5(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=sqrt(5)) == uniform(±1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(max(_torch_fan_in(shape), 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class SoftMoE(nn.Module):
    """Soft mixture of experts over a token sequence (SoftMoe.py:100-205)."""

    in_features: int
    out_features: int
    num_experts: int
    slots_per_expert: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, M, D_in)
        phi = self.param(
            "phi", _kaiming_a5,
            (self.in_features, self.num_experts, self.slots_per_expert),
        )
        w = self.param(
            "expert_kernel", _kaiming_a5,
            (self.num_experts, self.in_features, self.out_features),
        )
        # bias bound uses the WEIGHT's torch fan_in (= in·out for the 3-D
        # stacked expert weight, SoftMoe.py:58-60), not in_features alone
        bound = 1.0 / math.sqrt(self.in_features * self.out_features)
        b = self.param(
            "expert_bias",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -bound, bound),
            (self.num_experts, self.out_features),
        )
        x = x.astype(jnp.float32)
        logits = jnp.einsum("bmd,dnp->bmnp", x, phi)
        dispatch = jax.nn.softmax(logits, axis=1)
        bsz, m = logits.shape[:2]
        combine = jax.nn.softmax(
            logits.reshape(bsz, m, -1), axis=-1
        ).reshape(logits.shape)
        xs = jnp.einsum("bmd,bmnp->bnpd", x, dispatch)
        ys = jnp.einsum("bnpd,nde->bnpe", xs, w) + b[None, :, None, :]
        return jnp.einsum("bnpe,bmnp->bme", ys, combine)


class SoftMoEEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer with a Soft-MoE FFN
    (reference block/transformer.py:12-117). Part of the reference's MoE
    block library; the shipped UMoED head uses only the decoder stack, but
    the layer is exposed for config-driven encoder variants."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    num_experts: int = 8
    slots_per_expert: int = 8

    @nn.compact
    def __call__(self, src, key_padding_mask=None, train: bool = True):
        drop = lambda t, name: nn.Dropout(
            self.dropout, deterministic=not train, name=name
        )(t)
        sa, _ = MultiHeadAttention(self.d_model, self.nhead, jnp.float32,
                                   attn_dropout=self.dropout,
                                   torch_init=True, name="self_attn")(
            src, key_padding_mask=key_padding_mask, train=train
        )
        x = LayerNormFp32(name="norm1")(src + drop(sa, "drop1"))
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = jax.nn.relu(h)
        h = drop(h, "drop_ff")
        h = SoftMoE(self.dim_feedforward, self.d_model, self.num_experts,
                    self.slots_per_expert, name="moe")(h)
        return LayerNormFp32(name="norm2")(x + drop(h, "drop2"))


class DecoderLayer(nn.Module):
    """Post-norm transformer decoder layer; optional Soft-MoE FFN
    (reference block/transformer.py:153-320 / torch TransformerDecoderLayer)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    moe: bool = False
    num_experts: int = 8
    slots_per_expert: int = 8

    @nn.compact
    def __call__(self, tgt, memory, train: bool = True):
        drop = lambda t, name: nn.Dropout(
            self.dropout, deterministic=not train, name=name
        )(t)
        sa, _ = MultiHeadAttention(self.d_model, self.nhead, jnp.float32,
                                   attn_dropout=self.dropout,
                                   torch_init=True, name="self_attn")(
            tgt, train=train)
        x = LayerNormFp32(name="norm1")(tgt + drop(sa, "drop1"))
        ca, _ = MultiHeadAttention(self.d_model, self.nhead, jnp.float32,
                                   attn_dropout=self.dropout,
                                   torch_init=True, name="cross_attn")(
            x, kv=memory, train=train)
        x = LayerNormFp32(name="norm2")(x + drop(ca, "drop2"))
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = jax.nn.relu(h)
        h = drop(h, "drop_ff")
        if self.moe:
            h = SoftMoE(self.dim_feedforward, self.d_model, self.num_experts,
                        self.slots_per_expert, name="moe")(h)
        else:
            h = nn.Dense(self.d_model, name="linear2")(h)
        x = LayerNormFp32(name="norm3")(x + drop(h, "drop3"))
        return x


class UMoEDTokenHash(nn.Module):
    """Learned slots → decoder over modality tokens → per-slot classifier
    (reference hash_moe.py:22-60)."""

    embed_dim: int
    hidden_dim: int
    vocab_size: int
    set_dim: int
    decoder_heads: int = 8
    decoder_layers: int = 6
    dropout: float = 0.3
    moe: bool = False
    num_experts: int = 8
    slots_per_expert: int = 8
    hash_func: str = "linear_subspace"
    merge_func: str = "concatenate"

    @nn.compact
    def __call__(self, tokens: jax.Array, train: bool = True):
        x = tokens.astype(jnp.float32)
        if self.hidden_dim != self.embed_dim:
            x = jax.nn.relu(nn.Dense(self.hidden_dim, name="first_layer")(x))
        slots = self.param(
            "slots", nn.initializers.normal(1.0),
            (self.set_dim, self.hidden_dim),
        )
        tgt = jnp.broadcast_to(slots[None], (x.shape[0],) + slots.shape)
        for i in range(self.decoder_layers):
            tgt = DecoderLayer(
                self.hidden_dim, self.decoder_heads, 2048, self.dropout,
                self.moe, self.num_experts, self.slots_per_expert,
                name=f"layer_{i}",
            )(tgt, x, train=train)
        embeds = nn.Dense(self.vocab_size, name="classifier")(tgt)  # (B,M,V)

        if self.hash_func == "linear_subspace":
            hashed = linear_subspace_hash(embeds)
        elif self.hash_func == "softmax":
            h = jnp.mean(embeds, axis=1) if self.merge_func == "mean" else (
                embeds.reshape(embeds.shape[0], -1))
            hashed = softmax_hash(h)
        else:
            h = jnp.mean(embeds, axis=1) if self.merge_func == "mean" else (
                embeds.reshape(embeds.shape[0], -1))
            hashed = tanh_hash(h)
        return embeds, hashed


class UMoEDModel(BaseHashModel):
    clip_cfg: CLIPConfig
    output_dim: int = 64
    set_dim: int = 64
    txt_token_size: int = 32
    dropout: float = 0.3
    decoder_heads: int = 8
    decoder_layers: int = 6
    hidden_dim: int = 512
    moe: bool = True
    num_experts: int = 8
    slots_per_expert: int = 8
    fusion: bool = True
    hash_func: str = "linear_subspace"
    merge_func: str = "concatenate"
    # the reference UMoED never passes key_padding_mask to the backbone
    # (UMoED.py:102) — padding-position text tokens enter the decoder
    # memory. Default matches the reference; model.mask_padding: true
    # enables the masked variant.
    mask_padding: bool = False
    # the reference's non-fusion encode_txt routes text through
    # img_token_hash (hash_moe.py:130-138 — txt_token_hash is created but
    # never used, a live reference bug). Default False = each modality uses
    # its own head; set True for bit-level reference parity runs.
    compat_nonfusion_txt_via_img: bool = False

    def setup(self):
        self.backbone = CLIP(self.clip_cfg)
        assert self.output_dim % self.set_dim == 0, (
            f"'outputDim={self.output_dim}' must be the integer times of "
            f"'setDim={self.set_dim}'"
        )
        vocab = 2 ** (self.output_dim // self.set_dim)
        kw = dict(
            embed_dim=self.clip_cfg.embed_dim, hidden_dim=self.hidden_dim,
            vocab_size=vocab, set_dim=self.set_dim,
            decoder_heads=self.decoder_heads, decoder_layers=self.decoder_layers,
            dropout=self.dropout, moe=self.moe, num_experts=self.num_experts,
            slots_per_expert=self.slots_per_expert, hash_func=self.hash_func,
            merge_func=self.merge_func,
        )
        if self.fusion:
            self.hash_module = UMoEDTokenHash(**kw, name="hash_module")
        else:
            self.img_token_hash = UMoEDTokenHash(**kw, name="hash_img")
            self.txt_token_hash = UMoEDTokenHash(**kw, name="hash_txt")

    def _img_head(self):
        return self.hash_module if self.fusion else self.img_token_hash

    def _txt_head(self):
        if self.fusion:
            return self.hash_module
        if self.compat_nonfusion_txt_via_img:
            return self.img_token_hash
        return self.txt_token_hash

    def _image_tokens(self, image):
        cls_token, seq_tokens, _ = self.backbone.encode_image(image)
        return jnp.concatenate([cls_token[:, None, :], seq_tokens], axis=1)

    def encode_image(self, image, train: bool = True, with_embeds: bool = False):
        embeds, hashed = self._img_head()(self._image_tokens(image), train=train)
        return (embeds, hashed) if with_embeds else hashed

    def encode_text(self, text, key_padding_mask=None, train: bool = True,
                    with_embeds: bool = False):
        kpm = key_padding_mask if self.mask_padding else None
        _, tokens, _, _ = self.backbone.encode_text(text, kpm)
        embeds, hashed = self._txt_head()(tokens, train=train)
        return (embeds, hashed) if with_embeds else hashed

    def encode_fusion(self, image, text, key_padding_mask=None,
                      train: bool = True):
        """Joint modality encoding through the shared head
        (reference encoder_fusion, UMoED.py:112-123)."""
        assert self.fusion, "fusion encoding needs fusion=True"
        img_tokens = self._image_tokens(image)
        kpm = key_padding_mask if self.mask_padding else None
        _, txt_tokens, _, _ = self.backbone.encode_text(text, kpm)
        fused = jnp.concatenate([img_tokens, txt_tokens], axis=1)
        return self.hash_module(fused, train=train)

    def __call__(self, image, text, key_padding_mask=None, train: bool = True):
        img_embeds, img_hash = self.encode_image(image, train=train,
                                                 with_embeds=True)
        txt_embeds, txt_hash = self.encode_text(text, key_padding_mask,
                                                train=train, with_embeds=True)
        return img_embeds, img_hash, txt_embeds, txt_hash


def pairwise_set_distance(img, txt, extreme=False, t=0.01, return_sim=False,
                          mode="cosine"):
    """Slot-aligned pairwise distance (reference distance/__init__.py:22-42)."""
    if extreme:
        img = jax.nn.softmax(img / t, axis=-1)
        txt = jax.nn.softmax(txt / t, axis=-1)
    if mode == "cosine":
        sim = jnp.maximum(
            jnp.einsum("btl,ktl->btk", img, txt,
                       preferred_element_type=jnp.float32), 0.0
        )
        return jnp.mean(sim, axis=1) if return_sim else jnp.mean(1.0 - sim, axis=1)
    assert not return_sim, "euclidean pairwise distance cannot return similarity"
    from ..ops.metrics import euclidean_similarity

    b, tkn, l = img.shape
    block = euclidean_similarity(img.reshape(-1, l), txt.reshape(-1, l))
    block = block.reshape(b, tkn, -1, tkn).transpose(0, 2, 1, 3)
    diag = jnp.eye(tkn)
    return jnp.mean(jnp.mean(block * diag, axis=-1), axis=-1)


def umoed_loss_fn(*, set_dim, extreme, extreme_t, triplet, distance_mode,
                  distance_cfg, chamfer_cfg, hash_cfg):
    mode = distance_cfg.get("mode", "chamfer")
    denominator = distance_cfg.get("denominator", 2.0)
    temperature = distance_cfg.get("temperature", 16.0)
    tts = distance_cfg.get("temperature_txt_scale", 1.0)
    unif_alpha = chamfer_cfg.get("unif_alpha", 0.01)
    token_margin = chamfer_cfg.get("token_triplet_margin", 0.2)
    triplet_alpha = hash_cfg.get("triplet_alpha", 1.0)

    def loss(outputs, batch, method_state, step):
        img_embeds, img_hash, txt_embeds, txt_hash = outputs
        labels = batch["label"]
        norm = lambda x: x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8
        )
        img_n, txt_n = norm(img_embeds), norm(txt_embeds)

        if triplet:
            if mode == "pairwise":
                i2t_dist = pairwise_set_distance(img_n, txt_n, extreme,
                                                 extreme_t, mode=distance_mode)
                t2i_dist = pairwise_set_distance(txt_n, img_n, extreme,
                                                 extreme_t, mode=distance_mode)
            else:
                kw = dict(mode=mode, denominator=denominator,
                          temperature=temperature, temperature_txt_scale=tts)
                i2t_dist = jnp.maximum(
                    1.0 - setwise_similarity(img_n, txt_n, **kw), 0.0
                )
                t2i_dist = jnp.maximum(
                    1.0 - setwise_similarity(txt_n, img_n, **kw), 0.0
                )
            tokens_i2t = weighted_triplet_loss(i2t_dist, labels,
                                               margin=token_margin)
            tokens_t2i = weighted_triplet_loss(t2i_dist, labels,
                                               margin=token_margin)
        else:
            i2t_sim = pairwise_set_distance(img_n, txt_n, extreme, extreme_t,
                                            return_sim=True, mode=distance_mode)
            t2i_sim = pairwise_set_distance(txt_n, img_n, extreme, extreme_t,
                                            return_sim=True, mode=distance_mode)
            label_sim = calc_label_sim(labels, labels)
            clamp = lambda s: jnp.clip(s, -64.0, 64.0)
            tokens_i2t = -jnp.mean(
                label_sim * clamp(i2t_sim) - jax.nn.softplus(clamp(i2t_sim))
            )
            tokens_t2i = -jnp.mean(
                label_sim * clamp(t2i_sim) - jax.nn.softplus(clamp(t2i_sim))
            )

        # per-sample variant: UMoED passes 3-D sets into the shared
        # uniformity source (UMoED.py:317-318) where DIMCH pre-flattens
        div_i = batchwise_uniformity_loss_per_sample(img_n, set_dim)
        div_t = batchwise_uniformity_loss_per_sample(txt_n, set_dim)
        div = (div_i + div_t + 0.0) / 3.0

        triplet_total = (tokens_i2t + tokens_t2i) / 4.0
        total = triplet_total * triplet_alpha + unif_alpha * div

        loss_dict = {
            "All loss": total,
            "Tokens": {
                "Similarity": {"i2t": tokens_i2t, "t2i": tokens_t2i,
                               "All": triplet_total * triplet_alpha},
                "Diversity": {"i": div_i, "t": div_t,
                              "All": div * unif_alpha},
            },
        }
        return total, loss_dict, method_state

    return loss


@registry.register_model("UMoED")
class UMoEDMethod(Method):
    arch = "UMoED"
    code_mode = "sign"  # linear_subspace codes are already ±1; sign is identity

    def eval_code_dims(self) -> int:
        """Width of the binarized eval code.

        Only linear_subspace+concatenate emits exactly ``output_dim`` bits;
        the mean/concatenate merges of the tanh/softmax variants emit
        vocab-sized codes (the reference sizes its buffers to output_dim and
        would crash on those combos — runners/UMoED/runner.py:166-171).
        """
        m = self.module
        vocab = 2 ** (m.output_dim // m.set_dim)
        if m.hash_func == "linear_subspace":
            return m.output_dim
        if m.merge_func == "mean":
            return vocab
        return m.set_dim * vocab

    @classmethod
    def from_config(cls, cfg_model, output_dim: int = 16, train_num: int = 10000,
                    clip_cfg: Optional[CLIPConfig] = None) -> "UMoEDMethod":
        clip_cfg = resolve_clip_cfg(cfg_model, clip_cfg)
        g = (lambda k, d: cfg_model.get(k, d)) if cfg_model else (lambda k, d: d)
        # reference default is softmax (UMoED.py:28); linear_subspace is
        # what the shipped configs use but must be OPTED INTO
        hash_func = g("hash_func", "softmax")
        if "softmax" in hash_func:
            output_dim *= 2  # reference UMoED.py:139-140

        def section(name):
            sec = cfg_model.get(name, None) if cfg_model else None
            return sec if sec is not None else EmptyConfig()

        hidden = g("hidden_dim", 512)
        if hidden is None or isinstance(hidden, str):
            hidden = clip_cfg.embed_dim
        module = UMoEDModel(
            clip_cfg=clip_cfg,
            output_dim=output_dim,
            set_dim=g("setDim", 64),
            txt_token_size=g("txt_token_size", 32),
            mask_padding=g("mask_padding", False),
            dropout=g("dropout", 0.3),
            decoder_heads=g("decoder_heads", 8),
            decoder_layers=g("decoder_layers", 6),
            hidden_dim=hidden,
            moe=g("MoE", False),
            num_experts=g("num_experts", 3),
            slots_per_expert=g("slots_per_expert", 8),
            fusion=g("fusion", True),
            hash_func=hash_func,
            merge_func=g("merge_func", "mean"),
            compat_nonfusion_txt_via_img=g("compat_nonfusion_txt_via_img",
                                           False),
        )
        loss = umoed_loss_fn(
            set_dim=g("setDim", 64),
            extreme=g("extreme", True),
            extreme_t=g("extreme_T", 0.01),
            triplet=g("triplet", True),
            distance_mode=g("distance_mode", "cosine"),
            distance_cfg=section("distance"),
            chamfer_cfg=section("chamfer"),
            hash_cfg=section("hash_pars"),
        )
        return cls(module=module, loss=loss, cfg_model=cfg_model,
                   train_num=train_num)
