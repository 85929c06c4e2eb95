"""Chip microbenchmarks: matmul rate by contraction depth, loop overhead.

Usage:
    python -m cmh_tpu.tools.chip_microbench [--quick]

Measures, with the timing discipline this tunnel punished us into
(CLAUDE.md "Benchmarking traps": device-side scans, varied inputs, host
fetch of a data-dependent value, median of 3):

- square-matmul TFLOP/s at n = 1k/2k/4k/8k — on the round-2 v5e the rate
  is bounded by contraction depth K (~5/33/106/135 TF/s), NOT by M/N; the
  ViT-B/32 shapes (K=768) run at their K-bound rate already, which is why
  no kernel/layout work moved the encode time (CLAUDE.md "Chip compute
  reality"),
- model-shaped matmuls ((B·L, 768) @ (768, N)),
- per-`lax.scan`-iteration overhead (measured ~0.9 ms flat on the tunnel —
  chain ≥8 real steps per scan or the loop overhead pollutes readings).

Run this FIRST on any new TPU generation before optimizing: it tells you
where the hardware's practical ceiling is and whether small-K matmuls are
worth restructuring around.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="skip n=8192")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..utils.jax_setup import apply_platform_escape

    apply_platform_escape()
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    DT = jnp.bfloat16
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}")

    def med3(f, *stacks):
        float(f(*stacks))                      # compile + warm
        ts = []
        for r in range(3):
            s2 = stacks[0] + jnp.float32(r + 1).astype(stacks[0].dtype) * 1e-3
            jax.block_until_ready(s2)
            t0 = time.perf_counter()
            float(f(s2, *stacks[1:]))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    def mm_rate(M, K, N, iters=8):
        W = jnp.asarray(rng.randn(K, N), DT) * (1.0 / np.sqrt(K))
        xs = jnp.asarray(rng.randn(iters, M, K), DT) * 0.3

        @jax.jit
        def scan_f(xs, W):
            def body(c, x):
                x = x + (c * 1e-20).astype(x.dtype)
                y = jnp.matmul(x, W, preferred_element_type=DT)
                return c + jnp.sum(y, dtype=jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0.0), xs)[0]

        dt = med3(scan_f, xs, W) / iters
        print(f"({M},{K})@({K},{N}): {dt*1e3:8.3f} ms  "
              f"{2*M*K*N/dt/1e12:6.1f} TF/s")

    print("\n-- square matmuls (rate vs contraction depth K) --")
    for n in (1024, 2048, 4096) + (() if args.quick else (8192,)):
        mm_rate(n, n, n, iters=8 if n < 8192 else 2)

    print("\n-- model shapes (ViT-B/32 @ batch 256) --")
    mm_rate(12800, 768, 2304)      # qkv projection
    mm_rate(12800, 768, 3072)      # MLP up
    mm_rate(12800, 3072, 768)      # MLP down

    print("\n-- scan iteration overhead (trivial body) --")
    x0 = jnp.asarray(rng.randn(8, 128), DT)

    @jax.jit
    def scan_tiny(x):
        def body(c, _):
            return c * 1.0000001, ()
        y, _ = jax.lax.scan(body, x, None, length=256)
        return jnp.sum(y.astype(jnp.float32))

    float(scan_tiny(x0))
    t0 = time.perf_counter()
    float(scan_tiny(x0 + 1e-3))
    print(f"per-iteration: {(time.perf_counter()-t0)/256*1e6:.1f} us")


if __name__ == "__main__":
    sys.exit(main())
