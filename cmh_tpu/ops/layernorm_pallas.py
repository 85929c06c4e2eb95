"""Fused LayerNorm (Pallas/TPU): one pass over bf16 rows, fp32 statistics.

XLA lowers the fp32-stats LayerNorm in the CLIP towers into a
convert+reduce fusion plus layout copies that measure ~0.33 ms per call on
bf16[256,50,768] — ~20× off memory-bound speed-of-light (see CLAUDE.md
round-2 notes). This kernel reads a row-block once, computes mean/variance
in fp32 on the VPU, and writes the normalised bf16 rows in the same pass.

Semantics match ``models/clip/model.py:LayerNormFp32`` (flax nn.LayerNorm,
eps inside rsqrt, fast-variance E[x²]−E[x]²) which itself mirrors the
reference's fp32 LayerNorm wrapper (reference models/CLIP/model.py:157-163).

The backward (custom_vjp) recomputes the statistics per row-block and emits
dx in one pass plus per-block partial dgamma/dbeta that are summed outside
the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS = 1e-5
_BLOCK = 512          # rows per grid step


def _fwd_kernel(x_ref, g_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)                  # (R, D)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    # flax fast-variance incl. its max(0, ·) clamp (nn.LayerNorm)
    var = jnp.maximum(
        jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu), 0.0
    )
    inv = jax.lax.rsqrt(var + _EPS)
    y = (x - mu) * inv * g_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32
    )                                                   # (1,D) broadcasts
    o_ref[...] = y.astype(o_ref.dtype)


def _bwd_kernel(n_rows, x_ref, g_ref, do_ref, dx_ref, dg_ref, db_ref):
    x = x_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)                  # (1, D) broadcasts
    blk = x.shape[0]
    # mask padding rows of a ragged final block: their contents are
    # unspecified and would poison the dgamma/dbeta partial sums (a NaN
    # from rsqrt of garbage survives multiplication by zero)
    row = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    valid = (row + pl.program_id(0) * blk) < n_rows
    x = jnp.where(valid, x, 0.0)
    do = jnp.where(valid, do, 0.0)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu), 0.0
    )
    inv = jax.lax.rsqrt(var + _EPS)
    xhat = (x - mu) * inv
    # dgamma/dbeta: accumulate into one VMEM-resident (8, D) output block
    # revisited by every grid step (Mosaic requires sublane size 8; row 0
    # carries the sum, rows 1-7 stay zero)
    part_g = jnp.sum(do * xhat, axis=0, keepdims=True)
    part_b = jnp.sum(do, axis=0, keepdims=True)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == 0
    upd_g = jnp.where(row0, part_g, 0.0)
    upd_b = jnp.where(row0, part_b, 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = upd_g
        db_ref[...] = upd_b

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dg_ref[...] = dg_ref[...] + upd_g
        db_ref[...] = db_ref[...] + upd_b
    dy = do * g
    # dx = inv * (dy − mean(dy) − xhat·mean(dy·xhat))
    m1 = jnp.mean(dy, axis=-1, keepdims=True)
    m2 = jnp.mean(dy * xhat, axis=-1, keepdims=True)
    dx = inv * (dy - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _interpret() -> bool:
    from .fused import interpret_mode

    return interpret_mode()


@jax.custom_vjp
def _layernorm(x2d, gamma, beta):
    out, _ = _layernorm_fwd(x2d, gamma, beta)
    return out


def _layernorm_fwd(x2d, gamma, beta):
    n, d = x2d.shape
    blk = min(_BLOCK, n)
    grid = pl.cdiv(n, blk)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), x2d.dtype),
        interpret=_interpret(),
    )(x2d, gamma.reshape(1, d), beta.reshape(1, d))
    return out, (x2d, gamma)


def _layernorm_bwd(res, do):
    x2d, gamma = res
    n, d = x2d.shape
    blk = min(_BLOCK, n)
    grid = pl.cdiv(n, blk)
    dx, dg_part, db_part = pl.pallas_call(
        functools.partial(_bwd_kernel, n),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((blk, d), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0)),
            pl.BlockSpec((8, d), lambda i: (0, 0)),
            pl.BlockSpec((8, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x2d.dtype),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(x2d, gamma.reshape(1, d), do)
    return dx, dg_part[0], db_part[0]


_layernorm.defvjp(_layernorm_fwd, _layernorm_bwd)


def fused_layernorm(x: jax.Array, gamma: jax.Array, beta: jax.Array) -> jax.Array:
    """LayerNorm over the last axis, fp32 stats, output in x's dtype.

    Accepts any leading shape; differentiable w.r.t. all three arguments.
    """
    shape = x.shape
    out = _layernorm(x.reshape(-1, shape[-1]), gamma, beta)
    return out.reshape(shape)
