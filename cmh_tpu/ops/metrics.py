"""Retrieval metrics: label similarity, Hamming distance, vectorized mAP.

TPU-native re-implementation of the reference metrics library
(/root/reference/common/calc_utils.py:8-92). The reference computes mAP on
the host: it moves codes to CPU, builds the full fp matmul Hamming matrix,
sorts, then loops over queries in python (:84-89). Here everything is jitted
XLA on device; the per-query loop becomes cumsum-over-sorted-relevance, and
queries are processed in fixed-size chunks to bound HBM while keeping the
compile cache warm.

The Hamming matrix itself has two paths:
  - ``calc_hamming_dist``: ±1 codes on the MXU — bf16 matmul with fp32
    accumulation (exact for code lengths ≤ 2^24).
  - the packed XOR+popcount Pallas kernel in ``hamming_pallas.py`` for packed
    uint32 codes (8 bytes per 64-bit code instead of 128 bytes of bf16).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def calc_label_sim(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a @ bᵀ > 0) as float — multi-label ground-truth similarity."""
    sim = jnp.matmul(
        a.astype(jnp.float32), b.astype(jnp.float32).T,
        preferred_element_type=jnp.float32, precision="highest",
    )
    return (sim > 0).astype(jnp.float32)


def generate_weight_sim(a: jax.Array, b: jax.Array):
    """DCG-style weighted similarity (reference calc_utils.py:12-26).

    Returns (label_sim, weights) where weights[i,j] = (2^{s_ij} - 1) / Z_i and
    Z_i is the ideal DCG of row i with positional discount log2(j+2).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    sim_origin = jnp.matmul(a, b.T, preferred_element_type=jnp.float32, precision="highest")
    batch = a.shape[0]
    label_sim = (sim_origin > 0).astype(jnp.float32)
    ideal = -jnp.sort(-sim_origin, axis=1)  # descending
    th = jnp.log2(jnp.arange(batch, dtype=jnp.float32) + 2.0)  # log2(j+2)
    z = jnp.sum((2.0**ideal - 1.0) / th[None, :], axis=1, keepdims=True)
    weights = (2.0**sim_origin - 1.0) / z
    return label_sim, weights


def euclidean_similarity(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise euclidean distance matrix (torch.cdist p=2 equivalent)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    sq = (
        jnp.sum(a * a, axis=-1, keepdims=True)
        - 2.0 * jnp.matmul(a, b.T, preferred_element_type=jnp.float32, precision="highest")
        + jnp.sum(b * b, axis=-1)[None, :]
    )
    # zero-gradient-safe sqrt: d/dx sqrt(x) → ∞ at x=0 (the i==i diagonal of
    # a self-similarity matrix is exactly 0), which NaNs the backward pass.
    # torch.cdist defines a zero subgradient there; replicate that.
    positive = sq > 0.0
    safe = jnp.where(positive, sq, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def cosine_similarity(a: jax.Array, b: jax.Array, eps: float = 0.0) -> jax.Array:
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return jnp.matmul(a, b.T, preferred_element_type=jnp.float32, precision="highest")


def calc_hamming_dist(b1: jax.Array, b2: jax.Array) -> jax.Array:
    """Hamming distance between ±1 codes via the MXU: 0.5*(K - B1 @ B2ᵀ).

    ±1 values are exact in bf16 and products accumulate in fp32, so the
    result is exact for any realistic code length.
    """
    if b1.ndim < 2:
        b1 = b1[None, :]
    k = b2.shape[1]
    dot = jnp.matmul(
        b1.astype(jnp.bfloat16),
        b2.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    return 0.5 * (k - dot)


@functools.partial(jax.jit, static_argnames=("k",))
def _map_chunk(
    q_codes: jax.Array,       # (C, K) ±1
    r_codes: jax.Array,       # (N, K) ±1
    gnd: jax.Array,           # (C, N) float 0/1
    valid: jax.Array,         # (C,) float 0/1 — padding mask for the chunk
    k: Optional[int],
) -> jax.Array:
    """Sum of average precisions over one chunk of queries."""
    n = r_codes.shape[0]
    hamm = calc_hamming_dist(q_codes, r_codes)             # (C, N)
    # Stable tie-break on the original gallery order, matching a stable sort
    # of the reference's torch.sort on CPU. Distances are integers in [0, K],
    # so key = hamm * N + index is collision-free in fp64-exact int32 space.
    key = hamm.astype(jnp.int32) * jnp.int32(n) + jnp.arange(n, dtype=jnp.int32)
    order = jnp.argsort(key, axis=-1)
    gnd_sorted = jnp.take_along_axis(gnd, order, axis=-1)  # (C, N)
    csum = jnp.cumsum(gnd_sorted, axis=-1)
    tsum = csum[:, -1]
    total = tsum if k is None else jnp.minimum(tsum, jnp.float32(k))
    rank = jnp.arange(1, n + 1, dtype=jnp.float32)
    contrib = gnd_sorted * (csum <= total[:, None]) * (csum / rank[None, :])
    ap = jnp.where(total > 0, jnp.sum(contrib, axis=-1) / jnp.maximum(total, 1.0), 0.0)
    return jnp.sum(ap * valid)


def calc_map_k(
    q_b,
    r_b,
    query_labels,
    retrieval_labels,
    k: Optional[int] = None,
    chunk: int = 256,
) -> float:
    """mAP over Hamming ranking, reference-equivalent but fully on device.

    Matches /root/reference/common/calc_utils.py:58-92: for each query the
    gallery is sorted by Hamming distance (ties broken by original gallery
    index — a stable sort), and AP = mean over the first ``total`` relevant
    items of (relevant_rank / overall_rank), with total = min(#relevant, k).

    Queries with zero relevant items contribute 0 (the reference would
    propagate NaN; documented deviation — it cannot occur with the standard
    benchmark label sets).
    """
    q_b = jnp.asarray(q_b, dtype=jnp.float32)
    r_b = jnp.asarray(r_b, dtype=jnp.float32)
    ql = jnp.asarray(query_labels, dtype=jnp.float32)
    rl = jnp.asarray(retrieval_labels, dtype=jnp.float32)

    # Hamming distances are small ints: the counting-rank path computes the
    # identical mAP without the O(N log N) per-query sort (map_bucketed.py)
    if q_b.shape[1] <= 256:
        from .map_bucketed import calc_map_k_bucketed

        return calc_map_k_bucketed(q_b, r_b, ql, rl, k=k)

    num_query = q_b.shape[0]
    chunk = min(chunk, num_query)
    total_ap = 0.0
    for start in range(0, num_query, chunk):
        stop = min(start + chunk, num_query)
        size = stop - start
        qc = q_b[start:stop]
        lc = ql[start:stop]
        if size < chunk:  # pad to keep a single compiled shape
            qc = jnp.pad(qc, ((0, chunk - size), (0, 0)), constant_values=1.0)
            lc = jnp.pad(lc, ((0, chunk - size), (0, 0)))
        valid = (jnp.arange(chunk) < size).astype(jnp.float32)
        gnd = calc_label_sim(lc, rl)
        total_ap += float(_map_chunk(qc, r_b, gnd, valid, k))
    return total_ap / num_query


def calc_map_k_numpy(q_b, r_b, query_labels, retrieval_labels, k=None) -> float:
    """Pure-numpy oracle of the reference calc_map_k, for unit tests."""
    q_b = np.asarray(q_b, dtype=np.float64)
    r_b = np.asarray(r_b, dtype=np.float64)
    ql = np.asarray(query_labels, dtype=np.float64)
    rl = np.asarray(retrieval_labels, dtype=np.float64)
    num_query = ql.shape[0]
    if k is None:
        k = rl.shape[0]
    gnds = (ql @ rl.T > 0).astype(np.float64)
    hamms = 0.5 * (r_b.shape[1] - q_b @ r_b.T)
    ap_sum = 0.0
    for i in range(num_query):
        ind = np.argsort(hamms[i], kind="stable")
        gnd = gnds[i][ind]
        total = int(min(gnd.sum(), k))
        if total == 0:
            continue
        count = np.arange(1, total + 1, dtype=np.float64)
        tindex = np.nonzero(gnd)[0][:total].astype(np.float64) + 1.0
        ap_sum += float(np.mean(count / tindex))
    return ap_sum / num_query
