"""Retrieval serving: packed-code index with on-device top-k search.

The reference stops at dumping code matrices to ``.mat`` files
(runners/base.py:386-405); serving a hashing model in production needs an
index. ``RetrievalIndex`` keeps the gallery as 32-bit packed words (16× less
HBM than bf16 ±1 codes — 100M 256-bit items fit in 3.2 GB), computes query
Hamming distances with the Pallas XOR+popcount kernel in gallery blocks (the
(Q, N) distance matrix never materializes), optionally shards the gallery
over a device mesh, and returns exact top-k neighbors with ties broken by
gallery insertion order (the same stable order the mAP metrics use) — via
position-preserving merges on device, and a distance·N+index composite key
in the numpy fallback.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.hamming_pallas import hamming_packed
from .ops.hashing import pack_bits


# gallery block size for the numpy fallback ranking (monkeypatched in tests)
_FALLBACK_BLOCK = 1 << 16


def _pack_bits_host(codes: np.ndarray) -> np.ndarray:
    """Host-side mirror of ops.hashing.pack_bits (bit-identical layout) so
    CPU serving never touches a JAX backend."""
    n, k = codes.shape
    words = -(-k // 32)
    bits = (codes > 0).astype(np.uint32)
    if words * 32 - k:
        bits = np.pad(bits, ((0, 0), (0, words * 32 - k)))
    return (
        bits.reshape(n, words, 32) << np.arange(32, dtype=np.uint32)
    ).sum(axis=-1, dtype=np.uint32)


@functools.partial(jax.jit, static_argnames=("topk", "interpret", "bits"))
def _search(q_packed, g_packed, topk: int, interpret: bool = False,
            bits: int = 0):
    dist = hamming_packed(q_packed, g_packed, interpret=interpret,
                          bits=bits).astype(jnp.int32)  # (Q, N)
    # lax.top_k breaks ties toward lower indices — exactly the stable
    # insertion-order tie-break the mAP metrics use
    neg_top, idx = jax.lax.top_k(-dist, topk)
    return -neg_top, idx


# device gallery block rows: bounds the live distance tile at (Q, block)
# int32 instead of (Q, N) — at the module's 100M-item pitch the unblocked
# matrix would be 25.6 GB for 64 queries, over a v5e chip's HBM
_DEVICE_BLOCK = 1 << 20

# element chunk for hierarchical survivor location in the counting top-k:
# per-chunk survivor counts find each rank's chunk, then only hit chunks
# are scanned at element resolution (gather cost O(topk·chunk) per block)
_COLLECT_CHUNK = 1 << 10

# survivor-collection strategy for the counting top-k's pass 2:
#   "cumsum" — full-block survivor cumsum + searchsorted per rank. The
#              cumsum is pure sequential-bandwidth work the TPU streams at
#              HBM rate; on-chip at the 10M-item bench shape the whole
#              search runs 0.26–0.29 s (2.2–2.4e9 cmp/s, BENCH_r04 battery
#              captures of 2026-08-18 12:21/13:25 UTC).
#   "hier"   — per-chunk survivor counts + gathering only hit chunks. On
#              paper this avoids the log-pass cumsum traffic, but the
#              (Q, topk, _COLLECT_CHUNK) take_along_axis gathers serialize
#              on the TPU: the same bench shape measured 2.40 s — 8× slower
#              (tools/artifacts/battery/serving_forensics_r05.json). Kept
#              for A/B and for backends where gathers are cheap.
#   "trimat" — same searchsorted placement as "cumsum", but the cumulative
#              count is built as a chunk-256 lower-triangular bf16 matmul
#              on the MXU plus a tiny int32 cumsum over chunk totals
#              (the ops/map_bucketed tri-matmul idiom). XLA lowers
#              jnp.cumsum over a (Q, 2^20) int32 tile to ~20 shift-add
#              passes over HBM — measured as 79% of the whole 10M search
#              (serving_select_profile_r05.json); the two-level form reads
#              the mask once. Bit-equal to "cumsum" (tested): counts ≤ 256
#              are exact in bf16 with fp32 accumulation. On-chip at the
#              bench shape: 0.212 s (3.0e9 cmp/s) vs cumsum's 0.283 s.
#   "trimat2" (default) — "trimat" plus a two-stage rank resolve that
#              never materializes the global cumulative array: coarse
#              searchsorted over the tiny chunk-total cumsum, then an
#              8-step branchless lower_bound probing the within-chunk
#              counts. On-chip: 0.156 s (4.1e9 cmp/s) — 1.81× over
#              "cumsum" (tools/artifacts/battery/serving_trimat_ab_r05.json).
_COLLECT = os.environ.get("CMH_TPU_SERVING_COLLECT", "trimat2")

# distance-cache budget for the counting top-k (MB of uint8 (Q, N)
# distances). Both of its passes need every query×gallery distance; when
# the tile fits, one Pallas scoring dispatch feeds both passes instead of
# re-scoring the gallery in pass 2. 0 disables (score-twice streaming
# form, footprint independent of N). On-chip at the 10M bench shape
# (640 MB cache): 0.154 s vs 0.156 s without — the pass-2 rescore largely
# overlaps the collect's other work, so the cache is nearly neutral in
# time; kept default-on for the popcount sweep it removes. NOTE: feeding
# the cache through the scan xs as a (nblocks, Q, block) transpose
# measured 0.177 s — WORSE than rescoring; the contiguous dynamic_slice
# form below is the one that wins.
_DCACHE_MB = int(os.environ.get("CMH_TPU_SERVING_DCACHE_MB", "1024"))


def _topk_scan(q_packed, g_rows, topk: int, block: int, interpret: bool,
               start, n_valid):
    """Exact top-k over ``g_rows`` whose global indices are
    ``start + arange(rows)``; rows at global index ≥ ``n_valid`` are
    padding and masked to the sentinel distance. Blocks of ``block`` rows
    stream through a lax.scan with a running (dist, idx) candidate set,
    so the live distance tile is (Q, block), never (Q, rows).

    Tie order is preserved positionally, no composite key needed: each
    merge concatenates [carry (sorted, all indices < block start), block
    rows (in index order)], and ``lax.top_k`` breaks equal keys toward the
    lower position — so "equal distance → lower gallery index wins" holds
    inductively across blocks, matching the mAP metrics' stable order.
    ``start`` may be traced (the sharded path passes the device offset)."""
    qn = q_packed.shape[0]
    rows, w = g_rows.shape
    sentinel = jnp.iinfo(jnp.int32).max
    start = jnp.asarray(start, jnp.int32)
    n_valid = jnp.asarray(n_valid, jnp.int32)

    def score(gb, offset):
        d = hamming_packed(q_packed, gb, interpret=interpret).astype(jnp.int32)
        local_idx = offset + jnp.arange(gb.shape[0], dtype=jnp.int32)
        gidx = start + local_idx
        # zero-padded rows would score popcount(q) — mask both the scan's
        # block padding (local_idx ≥ rows; their gidx would collide with
        # the NEXT shard's real rows in the sharded path) and global
        # padding (gidx ≥ n_valid)
        ok = (local_idx < rows) & (gidx < n_valid)
        d = jnp.where(ok[None, :], d, sentinel)
        return d, jnp.broadcast_to(gidx[None, :], d.shape)

    if rows <= block:  # single tile: no scan machinery
        d, gi = score(g_rows, jnp.int32(0))
        neg, pos = jax.lax.top_k(-d, topk)
        return -neg, jnp.take_along_axis(gi, pos, axis=1)

    nblocks = -(-rows // block)
    g = jnp.pad(g_rows, ((0, nblocks * block - rows), (0, 0)))
    g = g.reshape(nblocks, block, w)
    offsets = jnp.arange(nblocks, dtype=jnp.int32) * block
    init = (
        jnp.full((qn, topk), sentinel, jnp.int32),
        jnp.full((qn, topk), n_valid, jnp.int32),
    )

    def body(carry, inp):
        cd, ci = carry
        gb, offset = inp
        d, gi = score(gb, offset)
        all_d = jnp.concatenate([cd, d], axis=1)
        all_i = jnp.concatenate([ci, gi], axis=1)
        neg, pos = jax.lax.top_k(-all_d, topk)
        return (-neg, jnp.take_along_axis(all_i, pos, axis=1)), None

    (dist, idx), _ = jax.lax.scan(body, init, (g, offsets))
    return dist, idx


def _topk_counting(q_packed, g_rows, topk: int, block: int, interpret: bool,
                   start, n_valid, bits: int = 0):
    """Sort-free exact top-k over ``g_rows`` — same contract as
    ``_topk_scan`` (global indices ``start + arange``, rows at global index
    ≥ ``n_valid`` are padding) but selection runs by counting rank instead
    of sorting: ``lax.top_k`` over a (Q, block) tile is a full per-row sort
    whose HBM traffic (~log²(block) passes over the distance tile) dwarfs
    the Pallas Hamming kernel itself. Hamming distances are small integers,
    so the k-th best is found by histogram instead (the same counting-rank
    idea as ``ops/map_pallas.py``):

      pass 1  per-query cumulative histogram of distances (≤256 bins) →
              threshold T = the k-th smallest distance, and how many
              strictly-better (< T) entries exist;
      pass 2  re-score each block and collect, in gallery-index order, the
              entries with d < T (all of them — fewer than k by choice of
              T) and the first ``k - strict`` ties at d == T. Survivor
              location strategy is ``_COLLECT`` (see the comment above the
              env knob): "trimat2" (default — MXU tri-matmul two-level
              cumulative counts + two-stage rank resolve; 0.156 s on-chip
              at the 10M bench shape), "trimat", "cumsum" (full-block
              jnp.cumsum + searchsorted; 0.283 s), or "hier" (element-
              resolution gathers; 8× slower on TPU, kept for A/B);
      final   one stable lexicographic ``lax.sort`` over the ≤2k collected
              candidates restores (distance, index) order.

    Ties at T collected in index order are exactly the stable "equal
    distance → lower gallery index wins" order, so results are bit-equal
    to ``_topk_scan`` / ``_search`` (tested). Only valid for distances
    that fit uint8 (bits ≤ 255 — the packed-serving mainline); wider codes
    route to the sort-based scan."""
    qn = q_packed.shape[0]
    rows, w = g_rows.shape
    max_d = bits if 0 < bits <= 32 * w else 32 * w
    assert max_d <= 255, "counting top-k requires uint8 distances"
    nbins = max_d + 1
    sentinel = jnp.iinfo(jnp.int32).max
    start = jnp.asarray(start, jnp.int32)
    n_valid = jnp.asarray(n_valid, jnp.int32)

    nblocks = -(-rows // block)
    g = jnp.pad(g_rows, ((0, nblocks * block - rows), (0, 0)))
    offsets = jnp.arange(nblocks, dtype=jnp.int32) * block

    # distance cache: both passes need every query×gallery distance, so
    # when the (Q, N) uint8 tile fits the budget, score the whole gallery
    # ONCE with a single Pallas dispatch and let both scans stream the
    # cached bytes — re-scoring in pass 2 costs a full popcount sweep
    # (~29.5 ms of the 156 ms 10M search) where re-reading costs ~1.6 ms
    # of HBM traffic. Off (0) restores the score-twice streaming form
    # whose footprint is independent of N.
    use_dcache = qn * nblocks * block <= _DCACHE_MB * (1 << 20)
    if use_dcache:
        d_all = hamming_packed(
            q_packed, g, interpret=interpret, bits=bits).astype(jnp.uint8)
        # scans close over d_all (a traced intermediate, not a host
        # constant — trap #5 doesn't apply) and slice each block out
        # contiguously; a (Q, nblocks, block) → (nblocks, Q, block)
        # transpose so the cache could ride the scan xs measured slower
        # than the rescore it saves (0.177 s vs 0.156 s at the 10M shape)
        payload = offsets

        def score(_, offset):
            db = jax.lax.dynamic_slice_in_dim(d_all, offset, block, axis=1)
            local = offset + jnp.arange(block, dtype=jnp.int32)
            ok = (local < rows) & (start + local < n_valid)
            return db, ok, start + local
    else:
        payload = g.reshape(nblocks, block, w)

        def score(gb, offset):
            d = hamming_packed(q_packed, gb, interpret=interpret, bits=bits)
            local = offset + jnp.arange(gb.shape[0], dtype=jnp.int32)
            ok = (local < rows) & (start + local < n_valid)
            return d.astype(jnp.uint8), ok, start + local

    # pass 1: per-query counts of (valid & d <= t) for every t — fused
    # compare+reduce reads the uint8 distance tile, never materializing
    # the (Q, nbins, block) broadcast
    ts = jnp.arange(nbins, dtype=jnp.uint8)

    def hist_body(acc, inp):
        d, ok, _ = score(*inp)
        cle = jnp.sum(
            (d[:, None, :] <= ts[None, :, None]) & ok[None, None, :],
            axis=-1, dtype=jnp.int32)
        return acc + cle, None

    cle, _ = jax.lax.scan(
        hist_body, jnp.zeros((qn, nbins), jnp.int32), (payload, offsets))

    total = cle[:, -1]
    # T = smallest distance whose cumulative count reaches k; if the shard
    # holds fewer than k valid rows (sharded ragged tail), collect them all
    # as strict and pad with sentinels, matching _topk_scan's init
    T = jnp.argmax(cle >= topk, axis=1).astype(jnp.int32)
    T = jnp.where(total >= topk, T, nbins)
    strict_total = jnp.where(
        T > 0,
        jnp.take_along_axis(
            cle, jnp.clip(T - 1, 0, nbins - 1)[:, None], axis=1)[:, 0],
        0)
    tie_quota = topk - strict_total

    slots = jnp.arange(topk, dtype=jnp.int32)
    # scan_unrolled: the default 'scan' method runs the ~20-step binary
    # search as a lax.scan, and on the tunnel backend every scan iteration
    # costs ~0.9ms flat (CLAUDE.md "Chip compute reality") — unrolling
    # keeps it at 20 tiny gathers inside one fused program
    searchsorted = jax.vmap(
        lambda a, v: jnp.searchsorted(
            a, v, side="left", method="scan_unrolled"))

    chunk = min(_COLLECT_CHUNK, block)
    nch = -(-block // chunk)
    pad_to = nch * chunk
    carange = jnp.arange(chunk, dtype=jnp.int32)

    def collect_chan_cumsum(mask, d, base_gidx, buf_d, buf_i, cnt):
        """Survivor placement via a full-block cumsum: ``cum[q, j]`` =
        number of survivors at positions ≤ j, so the channel-rank-r
        survivor sits at the first j with cum ≥ r (searchsorted). The
        cumsum streams the (Q, block) int32 tile at HBM rate — measured
        0.26 s for the whole 10M search vs 2.40 s for the gather-based
        hierarchical variant (see _COLLECT)."""
        cum = jnp.cumsum(mask, axis=1, dtype=jnp.int32)
        have = cum[:, -1]
        targ = slots[None, :] + 1 - cnt[:, None]   # 1-based channel rank
        valid = (targ >= 1) & (targ <= have[:, None])
        pos = searchsorted(cum, jnp.clip(targ, 1, None))
        pos = jnp.clip(pos, 0, cum.shape[1] - 1)
        cd = jnp.take_along_axis(d, pos, axis=1).astype(jnp.int32)
        ci = base_gidx + pos
        return (jnp.where(valid, cd, buf_d),
                jnp.where(valid, ci, buf_i), cnt + have)

    def collect_chan_trimat(mask, d, base_gidx, buf_d, buf_i, cnt):
        """``collect_chan_cumsum`` with the cumsum itself moved onto the
        MXU: within-chunk cumulative counts are one K=256 lower-triangular
        bf16 matmul (exact — counts ≤ 256, fp32 accumulation), chunk
        totals get a tiny int32 cumsum, and their sum reconstructs the
        identical global cumulative array in one elementwise pass. See
        the _COLLECT comment for the measured motivation."""
        tchunk = 256
        b = mask.shape[1]
        tnch = -(-b // tchunk)
        m, dd = mask, d
        if tnch * tchunk != b:
            m = jnp.pad(m, ((0, 0), (0, tnch * tchunk - b)))
            dd = jnp.pad(dd, ((0, 0), (0, tnch * tchunk - b)))
        iar = jnp.arange(tchunk)
        tri = (iar[:, None] <= iar[None, :]).astype(jnp.bfloat16)
        mf = m.astype(jnp.bfloat16).reshape(qn, tnch, tchunk)
        c1 = jax.lax.dot_general(
            mf, tri, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        tot = c1[..., -1]
        c2 = jnp.cumsum(tot, axis=1)
        cum = (c1 + (c2 - tot)[..., None]).reshape(qn, tnch * tchunk)
        have = cum[:, -1]
        targ = slots[None, :] + 1 - cnt[:, None]   # 1-based channel rank
        valid = (targ >= 1) & (targ <= have[:, None])
        pos = searchsorted(cum, jnp.clip(targ, 1, None))
        pos = jnp.clip(pos, 0, cum.shape[1] - 1)
        cd = jnp.take_along_axis(dd, pos, axis=1).astype(jnp.int32)
        ci = base_gidx + pos
        return (jnp.where(valid, cd, buf_d),
                jnp.where(valid, ci, buf_i), cnt + have)

    def collect_chan_trimat2(mask, d, base_gidx, buf_d, buf_i, cnt):
        """``collect_chan_trimat`` with a two-stage rank resolve: the
        global cumulative array is never materialized — a coarse
        searchsorted over the tiny (Q, nchunks) chunk-total cumsum finds
        each rank's chunk, then an 8-step branchless binary search probes
        the within-chunk counts (``c1``) directly. Cuts the 20 per-rank
        gather rounds over the (Q, block) array to 8 plus ~12 over an
        array 256× smaller."""
        tchunk = 256
        b = mask.shape[1]
        tnch = -(-b // tchunk)
        m, dd = mask, d
        if tnch * tchunk != b:
            m = jnp.pad(m, ((0, 0), (0, tnch * tchunk - b)))
            dd = jnp.pad(dd, ((0, 0), (0, tnch * tchunk - b)))
        iar = jnp.arange(tchunk)
        tri = (iar[:, None] <= iar[None, :]).astype(jnp.bfloat16)
        mf = m.astype(jnp.bfloat16).reshape(qn, tnch, tchunk)
        c1 = jax.lax.dot_general(
            mf, tri, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        c2 = jnp.cumsum(c1[..., -1], axis=1)
        have = c2[:, -1]
        targ = slots[None, :] + 1 - cnt[:, None]   # 1-based channel rank
        valid = (targ >= 1) & (targ <= have[:, None])
        tq = jnp.clip(targ, 1, None)
        cid = jnp.clip(searchsorted(c2, tq), 0, tnch - 1)
        prev = jnp.where(
            cid > 0,
            jnp.take_along_axis(c2, jnp.clip(cid - 1, 0, None), axis=1), 0)
        r = tq - prev                              # rank within the chunk
        c1f = c1.reshape(qn, tnch * tchunk)
        base = cid * tchunk
        # smallest off with c1[q, cid, off] >= r: branchless lower_bound —
        # off counts positions whose cumulative count is still < r
        off = jnp.zeros_like(cid)
        s = tchunk // 2
        while s:
            t = off + s
            val = jnp.take_along_axis(c1f, base + t - 1, axis=1)
            off = jnp.where(val < r, t, off)
            s //= 2
        pos = jnp.clip(base + off, 0, tnch * tchunk - 1)
        cd = jnp.take_along_axis(dd, pos, axis=1).astype(jnp.int32)
        ci = base_gidx + pos
        return (jnp.where(valid, cd, buf_d),
                jnp.where(valid, ci, buf_i), cnt + have)

    def collect_chan_hier(mask, d, base_gidx, buf_d, buf_i, cnt):
        """Place this block's survivors (``mask``, in gallery-index order)
        into their global-rank slots of (buf_d, buf_i). ``base_gidx`` is
        the block's first global gallery index (may be traced)."""
        m, dd = mask, d
        if pad_to != mask.shape[1]:
            m = jnp.pad(m, ((0, 0), (0, pad_to - mask.shape[1])))
            dd = jnp.pad(dd, ((0, 0), (0, pad_to - mask.shape[1])))
        chunk_cnt = m.reshape(qn, nch, chunk).sum(axis=-1, dtype=jnp.int32)
        chunk_cum = jnp.cumsum(chunk_cnt, axis=1)  # (Q, nch) — tiny
        have = chunk_cum[:, -1]
        targ = slots[None, :] + 1 - cnt[:, None]   # 1-based channel rank
        valid = (targ >= 1) & (targ <= have[:, None])
        tq = jnp.clip(targ, 1, None)
        cid = jnp.clip(searchsorted(chunk_cum, tq), 0, nch - 1)
        prev = jnp.where(
            cid > 0,
            jnp.take_along_axis(chunk_cum, jnp.clip(cid - 1, 0, None),
                                axis=1),
            0)
        r = tq - prev                              # rank within the chunk
        flat = (cid * chunk)[:, :, None] + carange[None, None, :]
        fm = jnp.take_along_axis(
            m, flat.reshape(qn, -1), axis=1).reshape(qn, topk, chunk)
        icum = jnp.cumsum(fm, axis=-1, dtype=jnp.int32)
        pos = jnp.argmax(icum >= r[:, :, None], axis=-1).astype(jnp.int32)
        fpos = cid * chunk + pos
        cd = jnp.take_along_axis(dd, fpos, axis=1).astype(jnp.int32)
        ci = base_gidx + fpos
        return (jnp.where(valid, cd, buf_d),
                jnp.where(valid, ci, buf_i), cnt + have)

    collect_chan = {"hier": collect_chan_hier,
                    "trimat": collect_chan_trimat,
                    "trimat2": collect_chan_trimat2}.get(
                        _COLLECT, collect_chan_cumsum)

    def collect_body(carry, inp):
        sd, si, td, ti, scnt, tcnt = carry
        gb, offset = inp
        d, ok, _ = score(gb, offset)
        base = start + offset
        strict = ok[None, :] & (d < T[:, None])
        tie = ok[None, :] & (d == T[:, None])
        sd, si, scnt = collect_chan(strict, d, base, sd, si, scnt)
        td, ti, tcnt = collect_chan(tie, d, base, td, ti, tcnt)
        return (sd, si, td, ti, scnt, tcnt), None

    full = jnp.full((qn, topk), sentinel, jnp.int32)
    pad_i = jnp.full((qn, topk), n_valid, jnp.int32)
    zero = jnp.zeros((qn,), jnp.int32)
    (sd, si, td, ti, _, _), _ = jax.lax.scan(
        collect_body, (full, pad_i, full, pad_i, zero, zero),
        (payload, offsets))

    keep_t = slots[None, :] < tie_quota[:, None]
    td = jnp.where(keep_t, td, sentinel)
    ti = jnp.where(keep_t, ti, n_valid)
    all_d = jnp.concatenate([sd, td], axis=1)
    all_i = jnp.concatenate([si, ti], axis=1)
    out_d, out_i = jax.lax.sort((all_d, all_i), dimension=1, num_keys=2)
    return out_d[:, :topk], out_i[:, :topk]


# selection strategy for large-gallery device search: "counting" (default
# for ≤255-bit codes — sort-free two-pass, see _topk_counting) or "sort"
# (the lax.top_k scan merge). Env override for on-chip A/B.
_SELECT = os.environ.get("CMH_TPU_SERVING_SELECT", "counting")


def _topk_large(q_packed, g_rows, topk, block, interpret, start, n_valid,
                bits: int = 0):
    w = g_rows.shape[1]
    max_d = bits if 0 < bits <= 32 * w else 32 * w
    if _SELECT == "counting" and max_d <= 255:
        return _topk_counting(q_packed, g_rows, topk, block, interpret,
                              start, n_valid, bits)
    return _topk_scan(q_packed, g_rows, topk, block, interpret,
                      start, n_valid)


@functools.partial(jax.jit,
                   static_argnames=("topk", "block", "interpret", "bits"))
def _search_blocked(q_packed, g_packed, topk: int, block: int,
                    interpret: bool = False, bits: int = 0):
    """Single-device exact blocked top-k, bit-equal to ``_search``."""
    n = g_packed.shape[0]
    return _topk_large(q_packed, g_packed, topk, block, interpret, 0, n,
                       bits)


@functools.lru_cache(maxsize=32)
def _build_sharded_search(mesh, topk: int, block: int, interpret: bool,
                          local_n: int, n: int, bits: int = 0):
    """Compiled gallery-sharded searcher, cached per (mesh, config) so
    repeated serving calls reuse one XLA program."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)

    def local_fn(q, g_local):
        d = jax.lax.axis_index(axes)
        return _topk_large(q, g_local, topk, block, interpret,
                           d.astype(jnp.int32) * local_n, n, bits)

    def run(q, g):
        dist, idx = shard_map(
            local_fn, mesh=mesh, in_specs=(P(), P(axes)),
            out_specs=(P(None, axes), P(None, axes)), check_vma=False,
        )(q, g)  # (Q, ndev·topk) candidates, shard-ordered
        neg, pos = jax.lax.top_k(-dist, topk)
        return -neg, jnp.take_along_axis(idx, pos, axis=1)

    return jax.jit(run)


def _shard_gallery(g_packed, mesh):
    """Pad the packed gallery to an even per-device split and place it
    row-sharded across the mesh. Done ONCE per index (cached by the
    caller): re-padding and re-distributing all N rows per search call
    would cost an O(N) transfer each time at the module's 100M-item pitch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ndev = mesh.size
    n = g_packed.shape[0]
    local_n = -(-n // ndev)
    g = jnp.pad(g_packed, ((0, local_n * ndev - n), (0, 0)))
    g = jax.device_put(g, NamedSharding(mesh, P(tuple(mesh.axis_names))))
    return g, local_n


def _search_sharded(q_packed, g_packed, topk: int, mesh, block: int,
                    interpret: bool = False, prepared=None, bits: int = 0):
    """Gallery-sharded multi-chip top-k: the gallery rows shard jointly
    over every mesh axis, each device runs the blocked candidate scan on
    its shard (queries replicated), and one all-gather of the
    device-count×topk candidates feeds a final replicated merge. Candidate
    blocks arrive in shard order (ascending global index) with each shard
    internally sorted, so ``lax.top_k``'s positional tie-break reproduces
    the single-device stable order exactly.

    ``prepared`` short-circuits the per-call pad+placement with a cached
    ``(sharded_gallery, local_n, n)`` triple (see ``RetrievalIndex``)."""
    if prepared is not None:
        g, local_n, n = prepared
    else:
        n = g_packed.shape[0]
        g, local_n = _shard_gallery(g_packed, mesh)
    assert 0 < topk <= local_n, (
        f"topk={topk} must fit one gallery shard ({local_n} rows)"
    )
    run = _build_sharded_search(mesh, topk, block, interpret, local_n, n,
                                bits)
    return run(q_packed, g)


class RetrievalIndex:
    """Append-only binary-code index over one modality's gallery."""

    def __init__(self, bits: int):
        self.bits = bits
        self._chunks = []
        self._packed: Optional[jax.Array] = None
        self._host_packed: Optional[np.ndarray] = None
        self._sharded = {}  # mesh -> (sharded gallery, local_n, n)
        self._count = 0

    def __len__(self) -> int:
        return self._count

    def add(self, codes) -> None:
        """Add ±1 codes (N, bits) to the gallery."""
        codes = jnp.asarray(codes, jnp.float32)
        assert codes.shape[1] == self.bits
        self._chunks.append(np.asarray(pack_bits(codes)))
        self._count += codes.shape[0]
        self._packed = None
        self._host_packed = None
        self._sharded.clear()

    def _gallery(self) -> jax.Array:
        if self._packed is None:
            assert self._chunks, "index is empty"
            self._packed = jnp.asarray(np.concatenate(self._chunks, axis=0))
        return self._packed

    def search(self, query_codes, topk: int = 10, block: Optional[int] = None,
               mesh=None) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k by Hamming distance.

        Returns (distances (Q, topk) int, indices (Q, topk) int) in
        ascending-distance order, ties by insertion order. Galleries larger
        than ``block`` rows (default ``_DEVICE_BLOCK``) stream through the
        blocked merge so the full (Q, N) distance matrix never materializes
        in HBM; with a ``jax.sharding.Mesh`` the gallery additionally shards
        over the devices (each chip searches its rows, one all-gather
        merges) — results are bit-equal on every path.
        """
        q = jnp.asarray(query_codes, jnp.float32)
        assert q.shape[1] == self.bits
        assert 0 < topk <= self._count
        qp = pack_bits(q)
        gallery = self._gallery()
        # Pallas compiles natively on TPU; CPU (tests) runs interpreted
        interpret = jax.default_backend() == "cpu"
        block = _DEVICE_BLOCK if block is None else block
        if mesh is not None and mesh.size > 1:
            if mesh not in self._sharded:
                g, local_n = _shard_gallery(gallery, mesh)
                self._sharded[mesh] = (g, local_n, gallery.shape[0])
            dist, idx = _search_sharded(qp, gallery, topk, mesh, block,
                                        interpret,
                                        prepared=self._sharded[mesh],
                                        bits=self.bits)
        elif gallery.shape[0] > block:
            dist, idx = _search_blocked(qp, gallery, topk, block, interpret,
                                        bits=self.bits)
        else:
            dist, idx = _search(qp, gallery, topk, interpret, self.bits)
        return np.asarray(dist), np.asarray(idx)

    def search_cpu(self, query_codes, topk: int = 10,
                   n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k on the host CPU — same results and tie order as
        ``search``, no accelerator required (deployment hosts serving an
        exported-encoder + index pair). Scores with the native popcount
        scorer (native/hash_ops.cpp, threaded over queries); falls back to a
        vectorized numpy path when the g++ toolchain is missing."""
        q = np.asarray(query_codes, np.float32)
        assert q.shape[1] == self.bits
        assert 0 < topk <= self._count
        qp = _pack_bits_host(q)
        if self._host_packed is None:
            assert self._chunks, "index is empty"
            self._host_packed = np.ascontiguousarray(
                np.concatenate(self._chunks, axis=0))
        gallery = self._host_packed
        from .native import hash_ops

        if hash_ops.available():
            return hash_ops.hamming_topk(qp, gallery, topk, n_threads)
        # numpy fallback: byte-LUT popcount, blocked over the gallery so the
        # (Q, block, bytes) intermediate stays bounded. Selection runs on the
        # composite key dist·N + global_idx (unique per item), so per-block
        # partitioning can never trade a lower-index tied candidate for a
        # higher one — the device path's exact tie order survives the merge.
        lut = np.unpackbits(
            np.arange(256, dtype=np.uint8)[:, None], axis=1
        ).sum(axis=1).astype(np.int32)
        qb = qp.view(np.uint8).reshape(qp.shape[0], -1)
        nq, n_total = qb.shape[0], gallery.shape[0]
        block = max(topk, _FALLBACK_BLOCK)
        cand = np.empty((nq, 0), np.int64)
        for start in range(0, n_total, block):
            gb = gallery[start:start + block].view(np.uint8).reshape(
                min(block, n_total - start), -1
            )
            dist = lut[qb[:, None, :] ^ gb[None, :, :]].sum(
                axis=-1, dtype=np.int32
            )
            key = dist.astype(np.int64) * n_total + np.arange(
                start, start + dist.shape[1], dtype=np.int64
            )[None, :]
            kk = min(topk, key.shape[1])
            part = np.argpartition(key, kk - 1, axis=1)[:, :kk]
            cand = np.concatenate(
                [cand, np.take_along_axis(key, part, axis=1)], axis=1)
        cand = np.sort(cand, axis=1)[:, :topk]
        return (cand // n_total).astype(np.int32), cand % n_total

    def save(self, path: str) -> None:
        np.savez(path, packed=np.concatenate(self._chunks, axis=0),
                 bits=self.bits, count=self._count)

    @classmethod
    def load(cls, path: str) -> "RetrievalIndex":
        data = np.load(path)
        index = cls(int(data["bits"]))
        index._chunks = [data["packed"]]
        index._count = int(data["count"])
        return index
