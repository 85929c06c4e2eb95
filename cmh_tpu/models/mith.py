"""MITH: multi-granularity interactive transformer hashing.

Re-implementation of /root/reference/models/MITH/{MITH.py,hash/hash.py}.
Components (all batch-first; the reference works in L,N,D):

- GlobalConceptLearning (GCL): residual pre-LN MLPs → bias-free linear
  concept head with tanh; **one module shared by both modalities**
  (hash.py:218 sets gcl_i = gcl_t).
- LocalizedTokenAggregation (LTA): per-token top-k over detached concept
  scores, -inf masking of pads/non-positives, softmax over tokens per
  concept, weighted token pooling → K concept tokens (hash.py:109-169).
- LocalConceptTransforming (LCT): LTA → sin-cos positional encoding → 2-layer
  CLIP Transformer → BitwiseHashing (K per-bit linear heads fused into one
  einsum; the reference loops over K nn.Linear modules, hash.py:68-85).
- Loss: memory-bank Bayesian likelihoods against train-set-sized buffers
  (banks live in ``method_state`` and are updated functionally via
  ``.at[idx].set`` — the reference mutates registered tensors in place,
  MITH.py:174-177), joint sign target B, quantization MSE, cls InfoNCE +
  batched token InfoNCE, and bidirectional cls↔token distillation
  (MITH.py:116-149,178-235).

Deviation from the reference (intended-behavior fix, SURVEY.md §7): the
reference's device-migration block overwrites three banks with
``img_buffer_cls`` (MITH.py:169-173); here each bank keeps its own values.
Eval code = cls_hash + token_hash then sign (runners/MITH/runner.py:125-131).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import calc_label_sim
from ..registry import registry
from .base import BaseHashModel, Method, resolve_clip_cfg
from .clip.model import CLIP, CLIPConfig, Transformer


def _l2_normalize(x: jax.Array) -> jax.Array:
    """torch F.normalize semantics: divide by max(||x||, 1e-12) — a raw
    norm division NaNs the whole loss on an exactly-zero row."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class ResidualMLPs(nn.Module):
    """Pre-LN residual MLP blocks (reference hash.py:9-38)."""

    org_dim: int
    num_layers: int = 2
    dropout: float = 0.0
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = jax.nn.gelu if self.activation == "gelu" else jax.nn.relu
        for i in range(self.num_layers):
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(x)
            h = nn.Dense(4 * self.org_dim, name=f"fc1_{i}")(h)
            h = act(h)
            h = nn.Dropout(self.dropout, deterministic=not train,
                           name=f"drop_{i}")(h)
            h = nn.Dense(self.org_dim, name=f"fc2_{i}")(h)
            x = x + h
        return x


def sincos_positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Fixed sin-cos table scaled by d^-1/2 (reference hash.py:40-65)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe / (d_model**0.5)


class BitwiseHashing(nn.Module):
    """K per-bit linear heads → tanh, fused into one einsum
    (reference hash.py:68-85 loops K nn.Linear(d,1) modules)."""

    org_dim: int
    k_bits: int

    @nn.compact
    def __call__(self, x):  # x: (N, K, D)
        bound = 1.0 / math.sqrt(self.org_dim)
        w = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -bound, bound),
            (self.k_bits, self.org_dim),
        )
        b = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -bound, bound),
            (self.k_bits,),
        )
        out = jnp.einsum("nkd,kd->nk", x.astype(jnp.float32), w) + b
        return jnp.tanh(out)


class GlobalConceptLearning(nn.Module):
    """(res-MLPs →) bias-free concept projection with tanh
    (reference hash.py:88-106)."""

    k_concept: int
    org_dim: int
    dropout: float = 0.0
    activation: str = "gelu"
    res_mlp_layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.res_mlp_layers != 0:
            x = ResidualMLPs(self.org_dim, self.res_mlp_layers, self.dropout,
                             self.activation, name="mlp")(x, train=train)
        concept = nn.Dense(self.k_concept, use_bias=False, name="concept")(x)
        return x, jnp.tanh(concept)


def localized_token_aggregation(x, concept_embed, top_k,
                                key_padding_mask=None):
    """Top-k concept pooling of tokens (reference hash.py:109-169).

    x: (N, L, D) tokens; concept_embed: (N, L, K) detached concept scores.
    Returns (merged (N, K, D), pseudo_label (N, L, K)).
    """
    sim = jax.lax.stop_gradient(concept_embed)
    neg_inf = jnp.float32(-jnp.inf)
    if key_padding_mask is not None:
        sim = jnp.where(key_padding_mask[:, :, None], neg_inf, sim)
    sim = jnp.where(sim > 0, sim, neg_inf)

    # keep top_k concepts per token (over K), others → -inf
    val = jax.lax.top_k(sim, top_k)[0]           # (N, L, top_k)
    val_min = val[..., -1:]                       # (N, L, 1)
    sim = jnp.where(sim >= val_min, sim, neg_inf)
    pseudo_label = (sim > 0).astype(jnp.float32)

    # softmax over tokens per concept; all -inf columns → 0 (reference
    # replaces NaNs after softmax, hash.py:160)
    m = jnp.max(sim, axis=1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.where(jnp.isfinite(sim), jnp.exp(sim - m), 0.0)
    denom = jnp.sum(e, axis=1, keepdims=True)
    weights = jnp.where(denom > 0, e / jnp.maximum(denom, 1e-30), 0.0)  # (N,L,K)

    merged = jnp.einsum("nlk,nld->nkd", weights, x.astype(jnp.float32))
    return merged, pseudo_label


class LocalConceptTransforming(nn.Module):
    """LTA → pos-enc → CLIP Transformer → bitwise hashing
    (reference hash.py:194-213)."""

    clip_embed_dim: int
    k_bits: int
    transformer_layers: int = 2
    dropout: float = 0.0
    top_k: int = 8

    @nn.compact
    def __call__(self, tokens, concept_embed, key_padding_mask=None,
                 train: bool = True):
        x, pseudo_label = localized_token_aggregation(
            tokens, concept_embed, self.top_k, key_padding_mask
        )
        pe = jnp.asarray(sincos_positional_encoding(self.k_bits,
                                                    self.clip_embed_dim))
        x = x + pe[None, : x.shape[1], :]
        x = nn.Dropout(self.dropout, deterministic=not train, name="pe_drop")(x)
        x, _ = Transformer(
            width=self.clip_embed_dim,
            layers=self.transformer_layers,
            heads=max(1, self.clip_embed_dim // 64),
            dtype=jnp.float32,
            name="transformer",
        )(x)
        hashed = BitwiseHashing(self.clip_embed_dim, self.k_bits,
                                name="hashing")(x)
        return hashed, pseudo_label, x


class MITHModel(BaseHashModel):
    clip_cfg: CLIPConfig
    output_dim: int = 16
    dropout: float = 0.0
    transformer_layers: int = 2
    activation: str = "gelu"
    top_k_label: int = 8
    res_mlp_layers: int = 2

    def setup(self):
        self.backbone = CLIP(self.clip_cfg)
        d = self.clip_cfg.embed_dim
        # single GCL shared across modalities AND across cls/tokens
        self.gcl = GlobalConceptLearning(
            k_concept=self.output_dim, org_dim=d, dropout=self.dropout,
            activation=self.activation, res_mlp_layers=self.res_mlp_layers,
            name="gcl",
        )
        self.lct_i = LocalConceptTransforming(
            d, self.output_dim, self.transformer_layers, self.dropout,
            self.top_k_label, name="lct_i",
        )
        self.lct_t = LocalConceptTransforming(
            d, self.output_dim, self.transformer_layers, self.dropout,
            self.top_k_label, name="lct_t",
        )
        self.img_concept_proj = nn.Dense(d, name="img_concept_proj")
        self.txt_concept_proj = nn.Dense(d, name="txt_concept_proj")

    def _encode_image_full(self, image, train: bool = True):
        cls_token, seq_tokens, _ = self.backbone.encode_image(image)
        cls_token = cls_token.astype(jnp.float32)
        seq_tokens = seq_tokens.astype(jnp.float32)
        res_img_cls, img_cls_hash = self.gcl(cls_token, train=train)
        res_img_cls = _l2_normalize(res_img_cls)
        _, token_concepts = self.gcl(seq_tokens, train=train)
        tokens_hash_i, _, trans_tokens_i = self.lct_i(
            seq_tokens, jax.lax.stop_gradient(token_concepts), None,
            train=train,
        )
        trans_tokens_i = self.img_concept_proj(trans_tokens_i)
        trans_tokens_i = _l2_normalize(trans_tokens_i)
        return res_img_cls, img_cls_hash, tokens_hash_i, trans_tokens_i

    def _encode_text_full(self, text, key_padding_mask, train: bool = True):
        txt_eos, txt_tokens, _, new_kpm = self.backbone.encode_text(
            text, key_padding_mask
        )
        txt_eos = txt_eos.astype(jnp.float32)
        txt_tokens = txt_tokens.astype(jnp.float32)
        res_txt_cls, txt_cls_hash = self.gcl(txt_eos, train=train)
        res_txt_cls = _l2_normalize(res_txt_cls)
        _, token_concepts = self.gcl(txt_tokens, train=train)
        tokens_hash_t, _, trans_tokens_t = self.lct_t(
            txt_tokens, jax.lax.stop_gradient(token_concepts), new_kpm,
            train=train,
        )
        trans_tokens_t = self.txt_concept_proj(trans_tokens_t)
        trans_tokens_t = _l2_normalize(trans_tokens_t)
        return res_txt_cls, txt_cls_hash, tokens_hash_t, trans_tokens_t

    def encode_image(self, image, train: bool = True):
        """Eval code: cls_hash + tokens_hash (runners/MITH/runner.py:125-131)."""
        _, img_cls_hash, tokens_hash_i, _ = self._encode_image_full(
            image, train=train
        )
        return img_cls_hash + tokens_hash_i

    def encode_text(self, text, key_padding_mask=None, train: bool = True):
        _, txt_cls_hash, tokens_hash_t, _ = self._encode_text_full(
            text, key_padding_mask, train=train
        )
        return txt_cls_hash + tokens_hash_t

    def __call__(self, image, text, key_padding_mask=None, train: bool = True):
        img = self._encode_image_full(image, train=train)
        txt = self._encode_text_full(text, key_padding_mask, train=train)
        return img + txt  # 8-tuple


def info_nce_loss(out_1, out_2, temperature=0.07):
    """Bidirectional InfoNCE on pooled features (reference MITH.py:116-128)."""
    bz = out_1.shape[0]
    scores = (out_1 @ out_2.T) / temperature
    targets = jnp.arange(bz)
    logp_12 = jax.nn.log_softmax(scores, axis=-1)
    logp_21 = jax.nn.log_softmax(scores.T, axis=-1)
    loss0 = -jnp.mean(jnp.take_along_axis(logp_12, targets[:, None], axis=-1))
    loss1 = -jnp.mean(jnp.take_along_axis(logp_21, targets[:, None], axis=-1))
    return 0.5 * (loss0 + loss1)


def info_nce_loss_bmm(out_1, out_2, temperature=0.07):
    """Per-sample token-to-token InfoNCE (reference MITH.py:130-149).
    out_*: (N, K, D) normalized concept tokens."""
    sim = jnp.einsum("nkd,njd->nkj", out_1, out_2) / temperature
    k = sim.shape[1]
    targets = jnp.arange(k)
    logp_1 = jax.nn.log_softmax(sim, axis=-1)          # rows
    logp_2 = jax.nn.log_softmax(sim.transpose(0, 2, 1), axis=-1)
    loss_1 = -jnp.mean(jnp.take_along_axis(
        logp_1, jnp.broadcast_to(targets[None, :, None], (sim.shape[0], k, 1)),
        axis=-1))
    loss_2 = -jnp.mean(jnp.take_along_axis(
        logp_2, jnp.broadcast_to(targets[None, :, None], (sim.shape[0], k, 1)),
        axis=-1))
    return 0.5 * (loss_1 + loss_2)


def bayesian_loss(a, b, label_sim):
    """-mean(S·s - log(1+e^s)), s = ½aᵀb clamped ±64 (reference MITH.py:151-157)."""
    s = jnp.clip(0.5 * (a @ b.T), -64.0, 64.0)
    return -jnp.mean(label_sim * s - jax.nn.softplus(s))


def mith_loss_fn(*, output_dim, hyper_tokens_intra, hyper_distill,
                 hyper_info_nce, hyper_cls_inter, hyper_quan, hyper_alpha,
                 hyper_lambda):
    def loss(outputs, batch, method_state, step):
        (res_img_cls, img_cls_hash, tokens_hash_i, trans_tokens_i,
         res_txt_cls, txt_cls_hash, tokens_hash_t, trans_tokens_t) = outputs
        idx = batch["index"]
        label_sim = calc_label_sim(method_state["train_labels"], batch["label"])

        # bank update first — the current batch sees its fresh codes
        # (reference MITH.py:174-177)
        sg = jax.lax.stop_gradient
        banks = {
            "img_cls": method_state["img_cls"].at[idx].set(sg(img_cls_hash)),
            "txt_cls": method_state["txt_cls"].at[idx].set(sg(txt_cls_hash)),
            "img_tokens": method_state["img_tokens"].at[idx].set(sg(tokens_hash_i)),
            "txt_tokens": method_state["txt_tokens"].at[idx].set(sg(tokens_hash_t)),
        }
        new_state = dict(method_state, **banks)

        lam = hyper_lambda
        b_target = jnp.sign(
            sg(img_cls_hash) * lam + sg(tokens_hash_i) * (1 - lam)
            + sg(txt_cls_hash) * lam + sg(tokens_hash_t) * (1 - lam)
        )

        intra_i = bayesian_loss(banks["img_tokens"], tokens_hash_i, label_sim)
        intra_t = bayesian_loss(banks["txt_tokens"], tokens_hash_t, label_sim)
        tokens_intra = hyper_tokens_intra * (intra_i + intra_t)

        inter_i2t = bayesian_loss(banks["img_cls"], txt_cls_hash, label_sim)
        inter_t2i = bayesian_loss(banks["txt_cls"], img_cls_hash, label_sim)
        cls_inter = hyper_cls_inter * (inter_i2t + inter_t2i)

        bsz = img_cls_hash.shape[0]
        h_i = img_cls_hash * 0.5 + tokens_hash_i * 0.5
        h_t = txt_cls_hash * 0.5 + tokens_hash_t * 0.5
        quan_i = jnp.sum((h_i - b_target) ** 2) / bsz / output_dim
        quan_t = jnp.sum((h_t - b_target) ** 2) / bsz / output_dim
        quan = hyper_quan * (quan_i + quan_t)

        nce_cls = info_nce_loss(res_img_cls, res_txt_cls)
        nce_tokens = info_nce_loss_bmm(trans_tokens_i, trans_tokens_t)
        nce = hyper_info_nce * (nce_cls + hyper_alpha * nce_tokens)

        item_1 = (jnp.sum((sg(img_cls_hash) - tokens_hash_i) ** 2)
                  + jnp.sum((sg(txt_cls_hash) - tokens_hash_t) ** 2))
        item_2 = 0.1 * (jnp.sum((img_cls_hash - sg(tokens_hash_i)) ** 2)
                        + jnp.sum((txt_cls_hash - sg(tokens_hash_t)) ** 2))
        distillation = hyper_distill * (item_1 + item_2) / bsz

        total = tokens_intra + cls_inter + quan + nce + distillation
        loss_dict = {
            "All loss": total,
            "LikeHood": {
                "intra_tokens": {"image": intra_i, "text": intra_t},
                "cls_inter": {"image": inter_i2t, "text": inter_t2i},
            },
            "Quantization": {"image": quan_i, "text": quan_t},
            "InfoNCE": {"cls": nce_cls, "tokens": nce_tokens},
            "Distillation": distillation,
        }
        return total, loss_dict, new_state

    return loss


@registry.register_model("MITH")
class MITHMethod(Method):
    arch = "MITH"
    code_mode = "sign"

    #: set by the trainer after the dataset is built (train-set label matrix
    #: feeding the memory-bank label similarity, runners/MITH/runner.py:87)
    train_labels: Optional[Any] = None

    @classmethod
    def from_config(cls, cfg_model, output_dim: int = 16, train_num: int = 10000,
                    clip_cfg: Optional[CLIPConfig] = None) -> "MITHMethod":
        clip_cfg = resolve_clip_cfg(cfg_model, clip_cfg)
        g = (lambda k, d: cfg_model.get(k, d)) if cfg_model else (lambda k, d: d)
        module = MITHModel(
            clip_cfg=clip_cfg,
            output_dim=output_dim,
            dropout=g("drop_out", 0.0),
            transformer_layers=g("transformer_layers", 2),
            activation=g("activation", "gelu"),
            top_k_label=g("top_k_label", 8),
            res_mlp_layers=g("res_mlp_layers", 2),
        )
        loss = mith_loss_fn(
            output_dim=output_dim,
            hyper_tokens_intra=g("hyper_tokens_intra", 1.0),
            hyper_distill=g("hyper_distill", 1.0),
            hyper_info_nce=g("hyper_info_nce", 50.0),
            hyper_cls_inter=g("hyper_cls_inter", 10.0),
            hyper_quan=g("hyper_quan", 8.0),
            hyper_alpha=g("hyper_alpha", 0.01),
            hyper_lambda=g("hyper_lambda", 0.99),
        )
        obj = cls(module=module, loss=loss, cfg_model=cfg_model,
                  train_num=train_num)
        return obj

    def init_method_state(self):
        assert self.train_labels is not None, (
            "MITH needs trainer-provided train_labels before optimizer build"
        )
        key = jax.random.PRNGKey(20)
        keys = jax.random.split(key, 4)
        shape = (self.train_num, self.output_dim)
        return {
            "img_cls": jax.random.normal(keys[0], shape),
            "txt_cls": jax.random.normal(keys[1], shape),
            "img_tokens": jax.random.normal(keys[2], shape),
            "txt_tokens": jax.random.normal(keys[3], shape),
            "train_labels": jnp.asarray(self.train_labels, jnp.float32),
        }
