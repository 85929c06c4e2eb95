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


def torch_default_dense(features: int, in_features: int, name: str = None,
                        dtype=jnp.float32) -> nn.Dense:
    """Dense with torch nn.Linear's DEFAULT init — kernel AND bias uniform
    ±1/√fan_in (kaiming_uniform(a=√5) + the bias bound from
    _calculate_fan_in_and_fan_out). For reference heads built as plain
    nn.Linear with no explicit init (e.g. DSPH hash/hash.py:10); flax's
    default (lecun_normal + zero bias) would start from a different
    distribution. ``in_features`` must be the call-time input width (flax
    bias_init cannot see the kernel's fan_in)."""
    bound = 1.0 / (in_features ** 0.5)

    def u(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return nn.Dense(
        features=features, kernel_init=u, bias_init=u, dtype=dtype,
        param_dtype=jnp.float32, name=name,
    )


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


class _TorchBatchNorm(nn.Module):
    """Exact torch BatchNorm semantics, which flax's nn.BatchNorm does NOT
    match: torch normalizes the batch with the *biased* variance but updates
    ``running_var`` with the *unbiased* (n/(n-1)) variance. The reference
    DCMHT image head runs BatchNorm1d eval-side every epoch, so the biased
    running-var of flax BatchNorm drifts all image codes by ~var·1/(n-1) —
    caught by tests/test_reference_e2e_parity.py."""

    features: int
    momentum: float = 0.1  # torch convention (weight of the new batch)
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = x.astype(jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        if train:
            mean = jnp.mean(x, axis=0)
            var = jnp.mean(jnp.square(x - mean), axis=0)  # biased: normalizes
            if not self.is_initializing():
                n = x.shape[0]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class BatchNorm1d(nn.Module):
    """torch BatchNorm1d equivalent (momentum 0.1, eps 1e-5, affine).

    Wraps ``_TorchBatchNorm`` under the child name ``bn`` to keep the
    param/batch_stats tree layout (…/norm/bn/{scale,bias,mean,var}) stable
    for checkpoints and the torch importer."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        return _TorchBatchNorm(self.features, name="bn")(x, train=train)
