"""CLIP backbone (ViT + text transformer) in flax.linen, TPU-first.

Behavioral re-implementation of the reference CLIP
(/root/reference/models/CLIP/model.py:153-413): ViT-B/32-style vision tower
(conv patchify → class token + positional embedding → pre-LN transformer with
QuickGELU → LayerNorm over all tokens → per-token projection) and the
12-layer causal text transformer with EOS pooling. Differences are deliberate
TPU-first choices, not behavior changes:

- batch-first layouts everywhere (the reference permutes to L,N,D for
  torch.nn.MultiheadAttention; XLA prefers leading batch),
- bf16 matmul compute with fp32 params and fp32 LayerNorm (mirrors the
  reference's fp16-weights / fp32-LN split, model.py:153-159 and :415-436),
- attention as explicit einsums so the head-averaged attention weights the
  hash methods consume (MITH/DIMCH/UMoED) come out of the same fused graph.

``return_patches`` parity: vision returns (cls, patch_tokens, cls→patch
attention from the last block, head-averaged) — reference model.py:263-268;
text returns (eos_token, all_tokens, EOS-row attention with the EOS column
zeroed, padding mask extended with the EOS position) — reference
model.py:373-396.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

EOT_TOKEN_ID = 49407


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 32
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    # compute dtype for matmuls; params always fp32
    dtype: Any = jnp.bfloat16

    @property
    def vision_heads(self) -> int:
        return self.vision_width // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size**2

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "CLIPConfig":
        """Small config for tests (fast on 1 CPU core)."""
        return cls(
            embed_dim=32,
            image_resolution=32,
            vision_layers=2,
            vision_width=64,
            vision_patch_size=8,
            context_length=16,
            vocab_size=49408,
            transformer_width=64,
            transformer_heads=2,
            transformer_layers=2,
            dtype=dtype,
        )


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class _LNParams(nn.Module):
    """Bare scale/bias holder so the param tree path (…/ln/{scale,bias})
    matches the previous nn.LayerNorm layout — checkpoint importers and the
    torch transplant depend on it."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class LayerNormFp32(nn.Module):
    """LayerNorm computed in fp32 regardless of activation dtype.

    On a single real TPU the fused Pallas kernel (ops/layernorm_pallas.py)
    replaces XLA's convert+reduce lowering, which measures ~20× off
    memory-bound speed-of-light at the tower shapes; the explicit-math path
    below is bit-compatible with flax nn.LayerNorm(use_fast_variance=True)
    including its max(0, var) clamp."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ...ops.fused import fused_kernels_ok

        scale, bias = _LNParams(x.shape[-1], name="ln")()
        if fused_kernels_ok():
            from ...ops.layernorm_pallas import fused_layernorm

            return fused_layernorm(x, scale, bias)
        orig = x.dtype
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu),
            0.0,
        )
        out = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return out.astype(orig)


class MultiHeadAttention(nn.Module):
    """Packed-QKV self-attention returning head-averaged weights.

    Parameter layout matches a packed torch in_proj (one (D, 3D) kernel) so
    reference checkpoints import with a single transpose.
    """

    width: int
    heads: int
    dtype: Any = jnp.bfloat16
    # torch nn.MultiheadAttention parity knobs for non-CLIP consumers
    # (UMoED's decoder): dropout on the attention probabilities and torch's
    # default init (xavier-uniform in_proj, ±1/√d Linear-default out_proj)
    # instead of CLIP's normal(d^-0.5)
    attn_dropout: float = 0.0
    torch_init: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                       # (B, L, D) queries
        attn_mask: Optional[jax.Array] = None,        # (L, S) additive
        key_padding_mask: Optional[jax.Array] = None,  # (B, S) bool, True=pad
        kv: Optional[jax.Array] = None,     # (B, S, D) keys/values (cross-attn)
        need_weights: bool = True,
        train: bool = False,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        b, l, d = x.shape
        h = self.heads
        hd = d // h

        if self.torch_init:
            xav = (6.0 / (d + 3 * d)) ** 0.5   # xavier on the packed (3d, d)
            lin = (1.0 / d) ** 0.5             # torch Linear default

            def u(bound):
                return lambda key, shape, dtype=jnp.float32:                     jax.random.uniform(key, shape, dtype, -bound, bound)

            in_init, out_init = u(xav), u(lin)
        else:
            in_init = out_init = nn.initializers.normal(d**-0.5)
        in_proj = self.param(
            "in_proj_kernel", in_init, (d, 3 * d), jnp.float32
        )
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32)
        out_kernel = self.param(
            "out_proj_kernel", out_init, (d, d), jnp.float32
        )
        out_bias = self.param("out_proj_bias", nn.initializers.zeros, (d,), jnp.float32)

        xc = x.astype(self.dtype)
        if kv is None:
            qkv = jnp.matmul(xc, in_proj.astype(self.dtype)) + in_bias.astype(
                self.dtype
            )
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            # cross-attention: same packed layout as torch MHA — query from x,
            # key/value from the memory sequence
            kvc = kv.astype(self.dtype)
            wq, wk, wv = jnp.split(in_proj.astype(self.dtype), 3, axis=-1)
            bq, bk, bv = jnp.split(in_bias.astype(self.dtype), 3)
            q = jnp.matmul(xc, wq) + bq
            k = jnp.matmul(kvc, wk) + bk
            v = jnp.matmul(kvc, wv) + bv
        s = k.shape[1]

        def heads_split(t):
            ln = t.shape[1]
            return t.reshape(b, ln, h, hd).transpose(0, 2, 1, 3)  # (B,H,L,hd)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        scale = hd**-0.5

        if not need_weights and kv is None and not (
            self.attn_dropout > 0.0 and train
        ):
            # fused kernel is self-attention only: its blocking assumes
            # S_kv == S_q (cross-attention kv would be truncated)
            from ...ops.fused import fused_kernels_ok

            if fused_kernels_ok():
                # fused Pallas path: no (B,H,L,S) probability tensor in HBM
                # (ops/attention_pallas.py); only taken when the caller
                # discards the weights — every block but the last
                from ...ops.attention_pallas import fused_attention

                out = fused_attention(q, k, v, scale, attn_mask,
                                      key_padding_mask)
                out = out.transpose(0, 2, 1, 3).reshape(b, l, d).astype(
                    self.dtype
                )
                out = jnp.matmul(out, out_kernel.astype(self.dtype)) + (
                    out_bias.astype(self.dtype)
                )
                return out, None

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        if attn_mask is not None:
            logits = logits + attn_mask[None, None, :, :].astype(jnp.float32)
        if key_padding_mask is not None:
            neg = jnp.asarray(-jnp.inf, dtype=jnp.float32)
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        weights = jax.nn.softmax(logits, axis=-1)                  # (B, H, L, L) fp32
        used = weights
        if self.attn_dropout > 0.0:
            # torch MHA applies dropout to the attention probabilities
            used = nn.Dropout(self.attn_dropout, deterministic=not train,
                              name="attn_drop")(weights)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", used.astype(self.dtype), v,
            preferred_element_type=jnp.float32,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d).astype(self.dtype)
        out = jnp.matmul(out, out_kernel.astype(self.dtype)) + out_bias.astype(
            self.dtype
        )
        avg_weights = (
            jnp.mean(weights, axis=1) if need_weights else None
        )                                                          # (B, L, L)
        return out, avg_weights


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, attn_mask=None, key_padding_mask=None,
                 need_weights=True):
        attn_out, attn_weight = MultiHeadAttention(
            self.width, self.heads, self.dtype, name="attn"
        )(LayerNormFp32(name="ln_1")(x), attn_mask, key_padding_mask,
          need_weights=need_weights)
        x = x + attn_out
        y = LayerNormFp32(name="ln_2")(x).astype(self.dtype)
        y = nn.Dense(self.width * 4, dtype=self.dtype, param_dtype=jnp.float32,
                     name="c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="c_proj")(y)
        x = x + y
        return x, attn_weight


class Transformer(nn.Module):
    """Stack of residual attention blocks; returns last block's attention."""

    width: int
    layers: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, attn_mask=None, key_padding_mask=None):
        attn_weight = None
        for i in range(self.layers):
            # only the last block's head-averaged weights are consumed
            # (reference model.py:263-268, :381-396) — earlier blocks take
            # the fused-attention path on TPU
            x, attn_weight = ResidualAttentionBlock(
                self.width, self.heads, self.dtype, name=f"resblocks_{i}"
            )(x, attn_mask, key_padding_mask,
              need_weights=(i == self.layers - 1))
        return x, attn_weight


class _ConvKernel(nn.Module):
    """Patch-embed kernel holder with nn.Conv's param layout (HWIO at
    conv1/kernel) so both patchify paths share one parameter."""

    patch: int
    width: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.patch, self.patch, 3, self.width), jnp.float32,
        )


class VisionTransformer(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, image: jax.Array):
        """image (B, H, W, 3) NHWC → (cls, patch_tokens, cls→patch attention).

        NHWC is the TPU-native conv layout (the reference uses NCHW,
        model.py:232-268); projections are applied to every token as in the
        reference (model.py:258-262).
        """
        cfg = self.cfg
        width = cfg.vision_width
        scale = width**-0.5
        p = cfg.vision_patch_size
        g = cfg.grid_size
        b = image.shape[0]

        from ...ops.fused import fused_kernels_ok

        if fused_kernels_ok():
            # non-overlapping patch conv ≡ patchify + matmul: the reshape
            # keeps (w, c) contiguous so the transpose moves whole 96-lane
            # rows, and the (B·49, 3072)@(3072, 768) projection rides the
            # MXU instead of XLA's large-kernel conv lowering. Same param
            # (conv1/kernel, HWIO) — checkpoint importers unaffected.
            kernel = _ConvKernel(p, width, name="conv1")()
            x = image.astype(cfg.dtype).reshape(b, g, p, g, p * 3)
            x = x.transpose(0, 1, 3, 2, 4).reshape(b, g * g, p * p * 3)
            x = jnp.matmul(x, kernel.astype(cfg.dtype).reshape(p * p * 3,
                                                               width))
        else:
            x = nn.Conv(
                features=width,
                kernel_size=(p, p),
                strides=(p, p),
                use_bias=False,
                dtype=cfg.dtype,
                param_dtype=jnp.float32,
                name="conv1",
            )(image.astype(cfg.dtype))
            x = x.reshape(b, -1, width)  # (B, grid*grid, width)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (width,), jnp.float32
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(scale),
            (cfg.num_patches + 1, width),
            jnp.float32,
        )
        cls_tok = jnp.broadcast_to(
            class_embedding.astype(cfg.dtype)[None, None, :], (b, 1, width)
        )
        x = jnp.concatenate([cls_tok, x], axis=1)
        x = x + positional_embedding.astype(cfg.dtype)[None, :, :]
        x = LayerNormFp32(name="ln_pre")(x)

        x, attn_weight = Transformer(
            width, cfg.vision_layers, cfg.vision_heads, cfg.dtype, name="transformer"
        )(x)

        x = LayerNormFp32(name="ln_post")(x)
        proj = self.param(
            "proj", nn.initializers.normal(scale), (width, cfg.embed_dim), jnp.float32
        )
        x = jnp.matmul(x.astype(cfg.dtype), proj.astype(cfg.dtype))

        cls_token = x[:, 0, :]
        seq_tokens = x[:, 1:, :]
        patch_attn = attn_weight[:, 0, 1:]  # cls query → patch keys, head-avg
        return cls_token, seq_tokens, patch_attn


class CLIP(nn.Module):
    """Full CLIP: vision tower + text transformer with shared embed space."""

    cfg: CLIPConfig

    def setup(self):
        cfg = self.cfg
        self.visual = VisionTransformer(cfg)
        self.transformer = Transformer(
            cfg.transformer_width,
            cfg.transformer_layers,
            cfg.transformer_heads,
            cfg.dtype,
            name="transformer",
        )
        self.token_embedding = nn.Embed(
            cfg.vocab_size,
            cfg.transformer_width,
            embedding_init=nn.initializers.normal(0.02),
            param_dtype=jnp.float32,
            name="token_embedding",
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.transformer_width),
            jnp.float32,
        )
        self.ln_final = LayerNormFp32(name="ln_final")
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(cfg.transformer_width**-0.5),
            (cfg.transformer_width, cfg.embed_dim),
            jnp.float32,
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(1.0 / 0.07), jnp.float32),
            (),
        )

    def encode_image(self, image: jax.Array):
        """Returns (cls_token, patch_tokens, patch_attention)."""
        return self.visual(image)

    def encode_text(self, text: jax.Array, key_padding_mask: Optional[jax.Array] = None):
        """Returns (eos_token, seq_tokens, eos_attention, new_key_padding_mask).

        EOS position is ``argmax(text)`` — the EOT id is the largest in the
        vocab (reference model.py:379). The returned attention row has its
        own EOS column zeroed (reference model.py:381-382); the returned
        padding mask additionally masks the EOS slot (reference model.py:384).
        """
        cfg = self.cfg
        b, l = text.shape
        x = self.token_embedding(text).astype(cfg.dtype)
        x = x + self.positional_embedding[:l, :].astype(cfg.dtype)

        causal = jnp.triu(jnp.full((l, l), -jnp.inf, dtype=jnp.float32), k=1)
        x, attn_weight = self.transformer(x, causal, key_padding_mask)

        eos_idx = jnp.argmax(text, axis=-1)                       # (B,)
        rows = jnp.arange(b)
        eos_attn = attn_weight[rows, eos_idx]                     # (B, L)
        eos_attn = eos_attn.at[rows, eos_idx].set(0.0)

        new_kpm = None
        if key_padding_mask is not None:
            new_kpm = jnp.logical_or(key_padding_mask, text == EOT_TOKEN_ID)

        x = self.ln_final(x)
        x = jnp.matmul(x.astype(cfg.dtype), self.text_projection.astype(cfg.dtype))
        seq_tokens = x
        eos_token = x[rows, eos_idx]
        return eos_token, seq_tokens, eos_attn, new_kpm

    def __call__(self, image, text, key_padding_mask=None):
        """CLIP contrastive logits (reference model.py:398-413)."""
        image_features = self.encode_image(image)[0]
        text_features = self.encode_text(text, key_padding_mask)[0]
        image_features = image_features / jnp.linalg.norm(
            image_features, axis=-1, keepdims=True
        )
        text_features = text_features / jnp.linalg.norm(
            text_features, axis=-1, keepdims=True
        )
        logit_scale = jnp.exp(self.logit_scale)
        logits_per_image = logit_scale * image_features @ text_features.T
        return logits_per_image, logits_per_image.T
