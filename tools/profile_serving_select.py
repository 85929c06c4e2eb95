"""Profile the serving counting-rank top-k: where do the milliseconds go?

Times, on the real chip, the two passes of ``serving._topk_counting``
separately (histogram threshold pass vs survivor-collect pass) plus the raw
Pallas Hamming scoring, at the bench shape (n=10M, q=64, 64-bit, topk=100).
Follows the tunnel benchmarking rules (CLAUDE.md): warmup per shape, vary
inputs per iteration, force a host value fetch.

Run: python -m tools.profile_serving_select  (or python tools/profile_serving_select.py)
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from cmh_tpu.serving import _DEVICE_BLOCK, _topk_counting
from cmh_tpu.ops.hamming_pallas import hamming_packed
from cmh_tpu.ops.hashing import pack_bits


def _rand_codes(n, bits, seed):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, size=(n, bits)) * 2 - 1).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("block", "bits", "nbins"))
def hist_pass(qp, g, block, bits, nbins):
    """Pass 1 of _topk_counting in isolation: per-query cumulative counts."""
    rows, w = g.shape
    nblocks = -(-rows // block)
    gp = jnp.pad(g, ((0, nblocks * block - rows), (0, 0)))
    gp = gp.reshape(nblocks, block, w)
    ts = jnp.arange(nbins, dtype=jnp.uint8)
    qn = qp.shape[0]

    def body(acc, gb):
        d = hamming_packed(qp, gb, bits=bits).astype(jnp.uint8)
        cle = jnp.sum(d[:, None, :] <= ts[None, :, None], axis=-1,
                      dtype=jnp.int32)
        return acc + cle, None

    cle, _ = jax.lax.scan(body, jnp.zeros((qn, nbins), jnp.int32), gp)
    return cle


@functools.partial(jax.jit, static_argnames=("block", "bits"))
def score_only(qp, g, block, bits):
    """Just the Pallas Hamming over all blocks, reduced to keep it honest."""
    rows, w = g.shape
    nblocks = -(-rows // block)
    gp = jnp.pad(g, ((0, nblocks * block - rows), (0, 0)))
    gp = gp.reshape(nblocks, block, w)

    def body(acc, gb):
        d = hamming_packed(qp, gb, bits=bits)
        return acc + d.astype(jnp.int32).sum(axis=1), None

    acc, _ = jax.lax.scan(body, jnp.zeros((qp.shape[0],), jnp.int32), gp)
    return acc


def timed(fn, qp, *args, runs=3):
    """Each run sees a distinct query set (trap #2: identical-input
    executions can be served from a backend cache) — the per-run variant is
    built and synced OUTSIDE the timed region."""
    variants = [jax.block_until_ready(jnp.roll(qp, r + 1, axis=0))
                for r in range(runs)]
    # warmup + compile
    out = fn(qp, *args)
    jax.tree_util.tree_map(
        lambda x: float(np.asarray(x).ravel()[0].sum()), out)
    best = []
    for qv in variants:
        t0 = time.perf_counter()
        out = fn(qv, *args)
        jax.tree_util.tree_map(
            lambda x: float(np.asarray(x).ravel()[0].sum()), out)
        best.append(time.perf_counter() - t0)
    return min(best), out


def main():
    n, q, bits, topk = 10_000_000, 64, 64, 100
    print(f"[profile] device: {jax.devices()[0]}", flush=True)
    g = pack_bits(jnp.asarray(_rand_codes(n, bits, 0)))
    qp = pack_bits(jnp.asarray(_rand_codes(q, bits, 1)))
    g = jax.block_until_ready(g)
    block = _DEVICE_BLOCK
    nbins = bits + 1

    t_score, _ = timed(score_only, qp, g, block, bits)
    print(f"score_only (hamming over {n} rows): {t_score*1e3:.1f} ms", flush=True)

    t_hist, _ = timed(hist_pass, qp, g, block, bits, nbins)
    print(f"hist_pass (score + 65-threshold reduce): {t_hist*1e3:.1f} ms", flush=True)

    full = jax.jit(lambda a, b: _topk_counting(a, b, topk, block, False, 0, n,
                                               bits))
    t_full, _ = timed(full, qp, g)
    print(f"full _topk_counting: {t_full*1e3:.1f} ms", flush=True)
    print(json.dumps({
        "n": n, "q": q, "bits": bits, "topk": topk,
        "score_ms": round(t_score * 1e3, 1),
        "hist_ms": round(t_hist * 1e3, 1),
        "full_ms": round(t_full * 1e3, 1),
        "collect_ms_est": round((t_full - t_hist) * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
