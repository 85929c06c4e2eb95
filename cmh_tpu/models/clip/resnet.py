"""ModifiedResNet vision tower (the alternative CLIP image encoder).

Re-implementation of /root/reference/models/CLIP/model.py:10-150: 3-conv
anti-aliased stem (avgpool instead of maxpool), Bottleneck blocks whose
strided convolutions are preceded by avgpool, and a final QKV attention
pool instead of global average pooling. No hashing method in the framework
uses this tower (every config is ViT-B/32), but the reference ships it and
RN checkpoints import through the same shape-inference loader.

Layout is NHWC (TPU-native conv layout; the reference is NCHW). The
attention pool computes only the pooled query row — attending the mean
token to all spatial tokens is mathematically identical to the reference's
full self-attention followed by taking row 0 (model.py:56-93).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _avg_pool(x: jax.Array, stride: int) -> jax.Array:
    return nn.avg_pool(x, (stride, stride), strides=(stride, stride))


class Bottleneck(nn.Module):
    inplanes: int
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda feats, k, name: nn.Conv(
            feats, (k, k), padding="SAME" if k == 3 else "VALID",
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )
        out = jax.nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        out = jax.nn.relu(bn("bn2")(conv(self.planes, 3, "conv2")(out)))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = bn("bn3")(conv(self.planes * self.expansion, 1, "conv3")(out))

        identity = x
        if self.stride > 1 or self.inplanes != self.planes * self.expansion:
            identity = x
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = nn.Conv(
                self.planes * self.expansion, (1, 1), use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32, name="downsample_conv",
            )(identity)
            identity = bn("downsample_bn")(identity)
        return jax.nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    embed_dim: int
    num_heads: int
    output_dim: int = 0
    spacial_dim: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, H, W, C) → tokens (B, HW, C)
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean_tok = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # (B, HW+1, C)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(c**-0.5),
            (self.spacial_dim**2 + 1, c),
            jnp.float32,
        )
        tokens = tokens + pos[None].astype(tokens.dtype)

        out_dim = self.output_dim or self.embed_dim
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense(c, "q_proj")(tokens[:, :1])                  # pooled query only
        k = dense(c, "k_proj")(tokens)
        v = dense(c, "v_proj")(tokens)
        hd = c // self.num_heads
        shape = lambda t: t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        q, k, v = shape(q), shape(k), shape(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * hd**-0.5, k,
                            preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        pooled = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        pooled = pooled.transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
        return dense(out_dim, "c_proj")(pooled)


class ModifiedResNet(nn.Module):
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224
    width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda feats, k, s, name: nn.Conv(
            feats, (k, k), strides=(s, s), padding=(k // 2, k // 2),
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )
        x = image.astype(self.dtype)
        x = jax.nn.relu(bn("bn1")(conv(self.width // 2, 3, 2, "conv1")(x)))
        x = jax.nn.relu(bn("bn2")(conv(self.width // 2, 3, 1, "conv2")(x)))
        x = jax.nn.relu(bn("bn3")(conv(self.width, 3, 1, "conv3")(x)))
        x = _avg_pool(x, 2)

        inplanes = self.width
        for stage, (blocks, planes, stride) in enumerate(
            zip(self.layers,
                (self.width, self.width * 2, self.width * 4, self.width * 8),
                (1, 2, 2, 2))
        ):
            for i in range(blocks):
                x = Bottleneck(
                    inplanes, planes, stride if i == 0 else 1, self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train=train)
                inplanes = planes * Bottleneck.expansion

        return AttentionPool2d(
            embed_dim=self.width * 32,
            num_heads=self.heads,
            output_dim=self.output_dim,
            spacial_dim=self.input_resolution // 32,
            dtype=self.dtype,
            name="attnpool",
        )(x)
