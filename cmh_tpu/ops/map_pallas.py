"""Fused Pallas counting-rank mAP over Hamming rankings (TPU).

Same math as ``map_bucketed`` (exact reference-equivalent mAP with stable
ties — see that module's docstring) but hand-tiled: the XLA version
materializes (C, L, V) one-hot/prefix tensors in HBM every gallery block,
which dominates eval wall time (10.2s per 4-direction coco-scale eval even
with the MXU tri-matmul cumsum). Design:

- Layout: gallery-major. The packed matrix ``d2T`` is (N, Q) uint8 (uint16
  for codes over 126 bits) holding ``2·distance + relevance`` — one narrow
  word per (gallery, query) pair carries everything the kernel needs, so
  there is a single input stream and no separate ground-truth matrix in HBM.
- Each kernel tile is (TN gallery rows × TQ·VP lanes): every query's VP
  bucket-indicator lanes sit side by side, so all elementwise ops and MXU
  contractions run at full lane occupancy with zero HBM intermediates.
- Within-block prefix counts are ONE lower-triangular matmul on the MXU per
  tile (0/1 bf16 inputs, f32 accumulation → exact counts); counts from
  earlier gallery blocks ride a (1, TQ·VP) VMEM scratch across the
  sequential gallery grid axis.
- Contributions are computed per lane (each query group has exactly one
  live lane — its own bucket) and column-reduced into an ``ap_lanes``
  accumulator; the tiny final per-bucket reduction happens on the host.
  Reducing lanes→items with matmuls inside the kernel was tried first and
  cost more than the divides it saved.
- All index-arithmetic constants (column-repeat matrix, bucket row,
  triangular mask, reducer) are PASSED IN and pinned to block (0, 0):
  computing them in-kernel re-ran integer div/mod by VP on the VPU every
  grid step, which dominated the first cut of this kernel (~28µs/step).

Two passes: (1) per-bucket global histograms → strictly-smaller prefix
counts on the host (tiny (Q, V) arrays), (2) AP accumulation. Exact for
counts < 2^24. Queries of all four retrieval directions are stacked on the
Q axis so a launch covers the whole ``trainer.valid`` eval
(reference hot spot: /root/reference/common/calc_utils.py:58-92).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hamming_pallas import _round_up
from .metrics import calc_label_sim

# widest supported code: the wide path's hi/lo split is exact to 65535, but
# the VP = bits+2 indicator lanes per query are the practical bound — at
# 4094 bits the tq=2 tiles still keep the ~8K-lane footprint tuned at 1022
# bits. Every real method config (TwDH long centers ship up to 2048 bits)
# sits far inside this.
MAX_PALLAS_BITS = 4094


def _lane_layout(bits: int, tq: int):
    """VP (buckets incl. pad-sentinel, padded so TQ·VP is lane-aligned)."""
    v = bits + 2  # buckets 0..bits plus the pad-row sentinel at bits+1
    step = max(128 // tq, 1)
    return _round_up(v, step)


def _consts(tq: int, tn: int, vp: int, wide: bool = False):
    """Host-built kernel constants (hoisted out of the grid loop)."""
    lanes = tq * vp
    q_of_lane = np.arange(lanes) // vp
    v_of_lane = np.arange(lanes) % vp
    erep = (q_of_lane[None, :] == np.arange(tq)[:, None])          # (TQ, L)
    vrow = v_of_lane[None, :].astype(np.float32)                   # (1, L)
    tril = (np.arange(tn)[None, :] <= np.arange(tn)[:, None])      # (TN, TN)
    del wide  # replication is bf16-exact on every path (see _replicate)
    return (
        jnp.asarray(erep, jnp.bfloat16),
        jnp.asarray(vrow, jnp.float32),
        jnp.asarray(tril, jnp.bfloat16),
    )


def _replicate(d2, erep, wide: bool = False):
    """(TN, TQ) uint8/uint16 ``2·d + g`` → per-lane (distance, relevance)
    via the 0/1 erep matmul, exactly.

    bf16 carries integers exactly only up to 256; distances on the wide
    path (257–1022 bits) therefore ride the MXU as two bf16-exact halves
    ``d = 256·hi + lo`` recombined in f32 — a plain f32 dot is NOT exact
    here: the TPU MXU runs f32 operands as a rounding bf16 pass under
    default precision (caught on-chip by battery stage 4; interpret mode
    computes true f32 and cannot see it), and Precision.HIGHEST would cost
    3× the passes of the two-dot split."""
    x = d2.astype(jnp.int32)
    d = jax.lax.shift_right_logical(x, 1)
    g = jnp.bitwise_and(x, 1).astype(jnp.bfloat16)
    grep = jnp.dot(g, erep, preferred_element_type=jnp.float32)
    if not wide:
        drep = jnp.dot(d.astype(jnp.bfloat16), erep,
                       preferred_element_type=jnp.float32)
        return drep, grep
    hi = jax.lax.shift_right_logical(d, 8).astype(jnp.bfloat16)
    lo = jnp.bitwise_and(d, 255).astype(jnp.bfloat16)
    drep = (
        jnp.dot(hi, erep, preferred_element_type=jnp.float32) * 256.0
        + jnp.dot(lo, erep, preferred_element_type=jnp.float32)
    )
    return drep, grep


def _hist_kernel(d2_ref, erep_ref, vrow_ref, hist_ref, rhist_ref,
                 *, tq, tn, vp, wide=False):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        hist_ref[...] = jnp.zeros_like(hist_ref)
        rhist_ref[...] = jnp.zeros_like(rhist_ref)

    drep, grep = _replicate(d2_ref[0], erep_ref[:], wide)
    a2 = (drep == vrow_ref[:]).astype(jnp.bfloat16)
    a2r = a2 * grep.astype(jnp.bfloat16)
    ones = jnp.ones((1, tn), jnp.bfloat16)
    hist_ref[...] += jnp.dot(
        ones, a2, preferred_element_type=jnp.float32)[None]
    rhist_ref[...] += jnp.dot(
        ones, a2r, preferred_element_type=jnp.float32)[None]


def _ap_kernel(d2_ref, less_ref, lessr_ref, total_ref, erep_ref,
               vrow_ref, tril_ref, ap_ref, eq_ref, eqr_ref,
               *, tq, tn, vp, wide=False):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        ap_ref[...] = jnp.zeros_like(ap_ref)
        eq_ref[:] = jnp.zeros_like(eq_ref)
        eqr_ref[:] = jnp.zeros_like(eqr_ref)

    drep, grep = _replicate(d2_ref[0], erep_ref[:], wide)
    a2 = (drep == vrow_ref[:]).astype(jnp.bfloat16)       # (TN, TQ·VP)
    a2r = a2 * grep.astype(jnp.bfloat16)

    # inclusive within-block prefix counts per (query, bucket) lane — 0/1
    # bf16 products with f32 accumulation: exact for any TN
    tril = tril_ref[:]
    cums = jnp.dot(tril, a2, preferred_element_type=jnp.float32)
    cumsr = jnp.dot(tril, a2r, preferred_element_type=jnp.float32)

    base = less_ref[0] + eq_ref[:]                        # (1, TQ·VP) f32
    baser = lessr_ref[0] + eqr_ref[:]
    # per-lane ranks: garbage off the live lane, masked by a2r below
    n_lane = cums + base
    r_lane = cumsr + baser
    mask = a2r.astype(jnp.float32) * (r_lane <= total_ref[0])
    contrib = mask * r_lane / jnp.maximum(n_lane, 1.0)
    ap_ref[...] += jnp.sum(contrib, axis=0, keepdims=True)[None]

    eq_ref[:] += cums[tn - 1 : tn, :]
    eqr_ref[:] += cumsr[tn - 1 : tn, :]


@functools.partial(
    jax.jit, static_argnames=("bits", "tq", "tn", "interpret")
)
def _map_counting_pallas(
    d2T: jax.Array,       # (Npad, Qpad) uint8: 2·distance + relevance;
                          # pad rows carry 2·(bits+1) (sentinel, irrelevant)
    k_arr: jax.Array,     # () f32 top-k cap (inf for mAP@all)
    bits: int,
    tq: int = 32,
    tn: int = 256,
    interpret: bool = False,
) -> jax.Array:
    n_pad, q_pad = d2T.shape
    assert n_pad % tn == 0 and q_pad % tq == 0
    wide = bits + 1 > 256
    vp = _lane_layout(bits, tq)
    q_tiles = q_pad // tq
    grid = (q_tiles, n_pad // tn)
    lanes = tq * vp
    erep, vrow, tril = _consts(tq, tn, vp, wide)

    # Mosaic wants the last block dim 128-divisible or equal to the array
    # dim — making the query tile the (full) minor axis satisfies the latter
    d23 = d2T.reshape(n_pad, q_tiles, tq).transpose(1, 0, 2)

    const_spec_erep = pl.BlockSpec((tq, lanes), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)
    const_spec_vrow = pl.BlockSpec((1, lanes), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)
    d2_spec = pl.BlockSpec((1, tn, tq), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, lanes), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    hist, rhist = pl.pallas_call(
        functools.partial(_hist_kernel, tq=tq, tn=tn, vp=vp, wide=wide),
        out_shape=(
            jax.ShapeDtypeStruct((q_tiles, 1, lanes), jnp.float32),
            jax.ShapeDtypeStruct((q_tiles, 1, lanes), jnp.float32),
        ),
        grid=grid,
        in_specs=[d2_spec, const_spec_erep, const_spec_vrow],
        out_specs=(row_spec, row_spec),
        interpret=interpret,
    )(d23, erep, vrow)

    # tiny (Q, VP) host-side algebra: strictly-smaller prefix counts
    hist_q = hist.reshape(q_pad, vp)
    rhist_q = rhist.reshape(q_pad, vp)
    less = jnp.cumsum(hist_q, axis=-1) - hist_q
    less_r = jnp.cumsum(rhist_q, axis=-1) - rhist_q
    tsum = jnp.sum(rhist_q, axis=-1)
    total = jnp.minimum(tsum, k_arr)              # (Qpad,)
    # lane layout for the kernel: each query's cap replicated over its VP
    total_rep = jnp.broadcast_to(total[:, None], (q_pad, vp))

    ap = pl.pallas_call(
        functools.partial(_ap_kernel, tq=tq, tn=tn, vp=vp, wide=wide),
        out_shape=jax.ShapeDtypeStruct((q_tiles, 1, lanes), jnp.float32),
        grid=grid,
        in_specs=[
            d2_spec,
            row_spec,
            row_spec,
            row_spec,
            const_spec_erep,
            const_spec_vrow,
            pl.BlockSpec((tn, tn), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=row_spec,
        scratch_shapes=[
            pltpu.VMEM((1, lanes), jnp.float32),
            pltpu.VMEM((1, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(
        d23,
        less.reshape(q_tiles, 1, lanes),
        less_r.reshape(q_tiles, 1, lanes),
        total_rep.reshape(q_tiles, 1, lanes),
        erep, vrow, tril,
    )

    ap_q = ap.reshape(q_pad, vp).sum(axis=-1)
    return jnp.where(total > 0, ap_q / jnp.maximum(total, 1.0), 0.0)


def _packed_dtype(bits: int):
    """Narrowest packed storage for ``2·(bits+1)`` (the pad sentinel)."""
    return jnp.uint8 if 2 * (bits + 1) <= 255 else jnp.uint16


def _packed_T(q_codes, r_codes, gnd, bits: int) -> jax.Array:
    """(N, C) gallery-major ``2·hamming + relevance`` via one bf16 MXU
    matmul (±1 products, f32 accumulation → exact)."""
    s = jnp.dot(r_codes.astype(jnp.bfloat16), q_codes.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32)
    d = 0.5 * (bits - s)
    return (2.0 * d + gnd.T).astype(_packed_dtype(bits))


def _grab_chunk(a, start, stop, chunk, fill):
    x = a[start:stop]
    if stop - start < chunk:
        x = jnp.pad(x, ((0, chunk - (stop - start)), (0, 0)),
                    constant_values=fill)
    return x


def _chunk_d2T(q_img, q_txt, ql, r_stack, rl, start, stop, chunk, bits,
               pad_rows, c_pad, sentinel):
    """One padded (Npad, c_pad) packed ``2·d + g`` matrix covering all four
    directions for queries [start, stop). The ONE shared implementation of
    the per-chunk padding/packing rules — the single-device and sharded
    eval paths must never diverge here. Tail chunks pad queries with +1
    codes and ZERO labels (total 0 → AP 0); gallery rows pad to the tile
    multiple and spare columns fill with the sentinel word (> every real
    bucket, relevance 0)."""
    qs = (_grab_chunk(q_img, start, stop, chunk, 1.0),
          _grab_chunk(q_txt, start, stop, chunk, 1.0))
    lc = _grab_chunk(ql, start, stop, chunk, 0.0)
    gnd = calc_label_sim(lc, rl)
    d2T = jnp.concatenate(
        [_packed_T(qc, rc, gnd, bits)
         for qc, rc in zip((qs[0], qs[1], qs[0], qs[1]), r_stack)],
        axis=1,
    )
    return jnp.pad(d2T, ((0, pad_rows), (0, c_pad - 4 * chunk)),
                   constant_values=sentinel)


def calc_map_k_4dir_pallas(
    q_img, q_txt, r_img, r_txt, query_labels, retrieval_labels,
    k: Optional[int] = None, chunk: int = 1024, tq: int = 32, tn: int = 256,
    interpret: bool = False,
):
    """All four retrieval directions in stacked-query Pallas launches.

    Exact same results as ``map_bucketed.calc_map_k_4dir`` (tested against
    it and the torch oracle); returns (i2t, t2i, i2i, t2t) floats.
    """
    q_img = jnp.asarray(q_img, jnp.float32)
    q_txt = jnp.asarray(q_txt, jnp.float32)
    r_img = jnp.asarray(r_img, jnp.float32)
    r_txt = jnp.asarray(r_txt, jnp.float32)
    ql = jnp.asarray(query_labels, jnp.float32)
    rl = jnp.asarray(retrieval_labels, jnp.float32)
    bits = int(q_img.shape[1])
    # ≤255 bits: bucket distances ride the erep matmul in bf16 (exact ints
    # up to 256). Wider codes split distances into two bf16-exact halves
    # (_replicate wide path: d = 256·hi + lo, exact while hi ≤ 255 ⇔
    # d ≤ 65535); the VP=bits+2 lane groups grow linearly, so callers must
    # shrink tq to keep the lane footprint ≈8192 and tiles inside VMEM
    # (map_bucketed._pallas_tiles: tq=8 to 1022 bits, tq=4 to 2046, tq=2 to
    # 4094 — covering TwDH's shipped 1024/2048-bit long centers,
    # /root/reference/data/transformer/TwDH/coco/long/{1024,2048}.pkl).
    assert bits + 1 <= MAX_PALLAS_BITS + 1, (
        f"counting-rank Pallas kernel supports codes up to {MAX_PALLAS_BITS} "
        "bits; longer codes take the chunked-argsort route"
    )

    num_query = q_img.shape[0]
    n = r_img.shape[0]
    n_pad = _round_up(n, tn)
    pad_rows = n_pad - n
    sentinel = np.dtype(_packed_dtype(bits)).type(2 * (bits + 1))

    k_arr = jnp.float32(np.inf if k is None else float(k))
    r_stack = (r_txt, r_img, r_img, r_txt)

    totals = np.zeros(4, dtype=np.float64)
    chunk = min(chunk, num_query)
    c_pad = _round_up(4 * chunk, tq)
    for start in range(0, num_query, chunk):
        stop = min(start + chunk, num_query)
        size = stop - start
        # tail chunks pad to the full chunk size so EVERY chunk runs the
        # same compiled programs (a 904-query tail otherwise costs its own
        # XLA compiles of the packing/label matmuls on first eval)
        d2T = _chunk_d2T(q_img, q_txt, ql, r_stack, rl, start, stop, chunk,
                         bits, pad_rows, c_pad, sentinel)
        ap = _map_counting_pallas(d2T, k_arr, bits, tq=tq, tn=tn,
                                  interpret=interpret)
        ap4 = np.asarray(ap[: 4 * chunk]).reshape(4, chunk)
        totals += ap4[:, :size].sum(axis=1)
    maps = totals / num_query
    return tuple(float(m) for m in maps)


def calc_map_k_4dir_pallas_sharded(
    q_img, q_txt, r_img, r_txt, query_labels, retrieval_labels,
    k: Optional[int] = None, mesh=None, chunk: int = 1024, tq: int = 32,
    tn: int = 256, interpret: bool = False,
):
    """Query-sharded multi-chip version of ``calc_map_k_4dir_pallas``.

    Each device runs the counting-rank kernel over its query shard against
    the replicated gallery inside ``shard_map`` (queries shard jointly over
    every mesh axis); one ``psum`` combines the per-direction AP sums. All
    padding — shard rounding, tail chunks, lane rounding — carries zero
    labels or the sentinel word, so each padded column contributes exactly
    0 AP (the 2·d+g packing makes its total 0); results match the
    single-device kernel bit-for-bit up to fp32 summation order.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    assert mesh is not None and mesh.size >= 1
    q_img = jnp.asarray(q_img, jnp.float32)
    q_txt = jnp.asarray(q_txt, jnp.float32)
    r_img = jnp.asarray(r_img, jnp.float32)
    r_txt = jnp.asarray(r_txt, jnp.float32)
    ql = jnp.asarray(query_labels, jnp.float32)
    rl = jnp.asarray(retrieval_labels, jnp.float32)
    bits = int(q_img.shape[1])
    assert bits + 1 <= 1023

    axes = tuple(mesh.axis_names)
    n_shard = mesh.size
    num_query = q_img.shape[0]
    q_pad_n = _round_up(num_query, n_shard)
    if q_pad_n > num_query:
        pad = ((0, q_pad_n - num_query), (0, 0))
        q_img = jnp.pad(q_img, pad, constant_values=1.0)
        q_txt = jnp.pad(q_txt, pad, constant_values=1.0)
        ql = jnp.pad(ql, pad)  # zero labels → zero AP contribution
    local_n = q_pad_n // n_shard
    lchunk = min(chunk, local_n)

    n = r_img.shape[0]
    n_pad = _round_up(n, tn)
    pad_rows = n_pad - n
    sentinel = np.dtype(_packed_dtype(bits)).type(2 * (bits + 1))
    k_arr = jnp.float32(np.inf if k is None else float(k))

    c_pad = _round_up(4 * lchunk, tq)

    def local_fn(qi, qt, lc, ri, rt, rlg):
        r_stack = (rt, ri, ri, rt)
        totals = jnp.zeros((4,), jnp.float32)
        for start in range(0, local_n, lchunk):
            stop = min(start + lchunk, local_n)
            d2T = _chunk_d2T(qi, qt, lc, r_stack, rlg, start, stop, lchunk,
                             bits, pad_rows, c_pad, sentinel)
            ap = _map_counting_pallas(d2T, k_arr, bits, tq=tq, tn=tn,
                                      interpret=interpret)
            totals = totals + ap[: 4 * lchunk].reshape(4, lchunk).sum(axis=1)
        return jax.lax.psum(totals, axes)

    qspec = P(axes)
    run = jax.jit(shard_map(
        local_fn, mesh=mesh,
        in_specs=(qspec, qspec, qspec, P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    ))
    totals = np.asarray(run(q_img, q_txt, ql, r_img, r_txt, rl))
    return tuple(float(m) for m in totals / num_query)
