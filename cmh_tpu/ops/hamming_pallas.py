"""Packed-code Hamming distance as a Pallas TPU kernel.

Replaces the reference eval hot spot (/root/reference/common/calc_utils.py:51-56
plus the CPU matmul in :58-92): ±1 codes are packed 32 bits/word into uint32
(`ops.hashing.pack_bits`), and the query×gallery distance matrix is computed as
XOR + SWAR popcount on the VPU, tiled over a (query_tile × gallery_tile) grid.

Why packed beats the MXU matmul formulation at scale: a 64-bit code is 8 bytes
packed vs 128 bytes as bf16 ±1, so HBM traffic per gallery element drops 16×,
and the popcount runs entirely in VMEM-resident uint32 tiles. The kernel holds
the gallery block transposed (W, TN) so each word slice broadcasts against the
query column without a relayout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashing import pack_bits


def _popcount_u32(v: jax.Array) -> jax.Array:
    """SWAR popcount of a uint32 array (result as int32).

    The classic ``(v * 0x01010101) >> 24`` byte-sum uses a 32-bit integer
    multiply, which the TPU VPU executes over many cycles; shift-adds keep
    the whole popcount in single-cycle ops.
    """
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    v = v + (v >> 8)
    v = v + (v >> 16)
    return (v & jnp.uint32(0x3F)).astype(jnp.int32)


def _hamming_kernel(q_ref, gt_ref, out_ref, *, words: int):
    """One (TQ, TN) output tile: sum_w popcount(q[:, w] ^ gT[w, :])."""
    acc = jnp.zeros(out_ref.shape, dtype=jnp.int32)
    for w in range(words):  # static unroll — words = ceil(K/32) is tiny
        qw = q_ref[:, w : w + 1]   # (TQ, 1) uint32
        gw = gt_ref[w : w + 1, :]  # (1, TN) uint32
        acc = acc + _popcount_u32(jnp.bitwise_xor(qw, gw))
    out_ref[:] = acc.astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("tile_q", "tile_n", "interpret", "out_dtype", "bits"),
)
def hamming_packed(
    q_packed: jax.Array,
    g_packed: jax.Array,
    tile_q: int = 256,
    tile_n: int = 512,
    interpret: bool = False,
    out_dtype=None,
    bits: int = 0,
) -> jax.Array:
    """Hamming distances between packed codes.

    Args:
      q_packed: (Q, W) uint32 packed query codes.
      g_packed: (N, W) uint32 packed gallery codes.
      out_dtype: output element type. Defaults to the narrowest unsigned int
        that holds the max distance — the kernel is bound by writing the
        (Q, N) output, so narrow dtypes are a direct bandwidth multiplier.
      bits: the true code length when the caller knows it (defaults to the
        padded width 32·W). Matters at the uint8 boundary: 225–255-bit
        codes pack to 8 words (32·8 = 256 would select uint16) but every
        real distance fits uint8.
    Returns:
      (Q, N) Hamming distance matrix. Padding bits cancel in XOR as long as
      both operands were packed with `pack_bits` (pad bits = 0).
    """
    q, w = q_packed.shape
    n, w2 = g_packed.shape
    assert w == w2, f"word-width mismatch: {w} vs {w2}"
    if out_dtype is None:
        max_d = bits if 0 < bits <= 32 * w else 32 * w
        out_dtype = (
            jnp.uint8 if max_d <= 255 else
            jnp.uint16 if max_d <= 65535 else jnp.int32
        )

    tile_q = min(tile_q, _round_up(q, 8))
    tile_n = min(tile_n, _round_up(n, 128))
    q_pad = _round_up(q, tile_q)
    n_pad = _round_up(n, tile_n)

    qp = jnp.pad(q_packed, ((0, q_pad - q), (0, 0)))
    gt = jnp.pad(g_packed, ((0, n_pad - n), (0, 0))).T  # (W, n_pad)

    grid = (q_pad // tile_q, n_pad // tile_n)
    out = pl.pallas_call(
        functools.partial(_hamming_kernel, words=w),
        out_shape=jax.ShapeDtypeStruct((q_pad, n_pad), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, w), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_q, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qp, gt)
    return out[:q, :n]


def hamming_packed_reference(q_packed: jax.Array, g_packed: jax.Array) -> jax.Array:
    """Pure-jnp oracle for the Pallas kernel (XOR + popcount via unpacking)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    x = jnp.bitwise_xor(q_packed[:, None, :], g_packed[None, :, :])
    bits = (x[..., None] >> shifts) & jnp.uint32(1)
    return bits.sum(axis=(-1, -2)).astype(jnp.int32)


def hamming_from_codes(
    q_codes: jax.Array, g_codes: jax.Array, interpret: bool = False,
) -> jax.Array:
    """±1 codes → packed → Pallas Hamming matrix.

    A second kernel that unpacked the words in VMEM and fed the MXU
    (``hamming_packed_mxu``) was built and retired in round 2: its in-kernel
    unpack lowered to per-word shift/concat chains that left it ~5× slower
    than this VPU kernel (32ms vs 6ms at 5k×110k×256-bit). The measured
    crossover: when codes are already resident UNPACKED as bf16 ±1, a plain
    dense matmul wins outright (~2.1e11 cmp/s, see ops/metrics.
    calc_hamming_dist); packed kernels only pay off when HBM footprint or
    bandwidth is the constraint, and there the XOR+popcount formulation is
    the right one.
    """
    return hamming_packed(pack_bits(q_codes), pack_bits(g_codes),
                          interpret=interpret, bits=q_codes.shape[1])
