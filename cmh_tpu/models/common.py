"""Shared head building blocks used by several methods."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.hashing import kaiming_uniform_fan_out


class SingleTokenAttention(nn.Module):
    """Self-attention over a single token (DCMHT head front-end).

    The reference wraps the pooled CLIP feature in a length-1 sequence and
    runs nn.MultiheadAttention over it (models/DCMHT/hash/hash.py:39-46).
    With one token the softmax over one key is identically 1, so the layer
    reduces *exactly* to ``out_proj(v_proj(x))``. We keep the packed-QKV
    parameter layout for checkpoint-import parity but compute only the live
    path — the q/k projections are mathematically dead.
    """

    width: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = self.width
        in_proj = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (d, 3 * d), jnp.float32
        )
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32)
        out_kernel = self.param(
            "out_proj_kernel", nn.initializers.xavier_uniform(), (d, d), jnp.float32
        )
        out_bias = self.param("out_proj_bias", nn.initializers.zeros, (d,), jnp.float32)
        v = jnp.matmul(x.astype(self.dtype), in_proj[:, 2 * d :].astype(self.dtype))
        v = v + in_bias[2 * d :].astype(self.dtype)
        out = jnp.matmul(v, out_kernel.astype(self.dtype)) + out_bias.astype(self.dtype)
        return out


def kaiming_dense(features: int, name: str = None, dtype=jnp.float32) -> nn.Dense:
    """Dense with the reference's kaiming-uniform(fan_out) init + zero bias
    (models/common/hash.py:5-18)."""
    return nn.Dense(
        features=features,
        kernel_init=kaiming_uniform_fan_out,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class BatchNorm1d(nn.Module):
    """torch BatchNorm1d equivalent (momentum 0.1, eps 1e-5, affine)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # flax momentum = 1 - torch momentum(0.1)
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )
        return bn(x.astype(jnp.float32))
