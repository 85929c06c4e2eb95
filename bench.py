"""Benchmark: runs on one real TPU chip, prints ONE JSON line.

Primary metric: packed-code Hamming throughput (query×gallery comparisons/sec
per chip) at coco eval scale (5000 queries × 110k gallery, 64-bit codes) —
the driver's north-star target is ≥100M cmp/s/chip (BASELINE.md), so
``vs_baseline`` = value / 1e8. Extra fields report the encode throughput
(image+text pairs/sec/chip on the ViT-B/32 DCMHT forward) and the full
4-direction mAP@all eval wall time at 64 bits.

Remote TPU compiles through the axon tunnel can take many minutes on a cold
cache; the mAP section therefore runs in a subprocess with a hard timeout so
the primary JSON line is always produced, and all compiles go through a
repo-local persistent compilation cache.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _configure_jax():
    import jax

    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _sync(x):
    import jax

    jax.block_until_ready(x)
    return x


def bench_hamming(num_q=5000, num_r=110_000, bits=64, iters=5):
    import jax.numpy as jnp
    import numpy as np

    from cmh_tpu.ops.hamming_pallas import hamming_packed
    from cmh_tpu.ops.hashing import pack_bits

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.choice([-1.0, 1.0], size=(num_q, bits)).astype(np.float32))
    r = jnp.asarray(rng.choice([-1.0, 1.0], size=(num_r, bits)).astype(np.float32))
    qp = _sync(pack_bits(q))
    rp = _sync(pack_bits(r))
    _sync(hamming_packed(qp, rp))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = hamming_packed(qp, rp)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    return num_q * num_r / dt


def bench_encode_best(batches=(64, 256), iters=5):
    """Best pairs/s over batch sizes (MXU utilization grows with batch)."""
    return max(bench_encode(b, iters) for b in batches)


def bench_encode(batch=64, iters=5):
    import jax
    import jax.numpy as jnp

    import cmh_tpu  # noqa: F401
    from cmh_tpu.config import config_from_dict
    from cmh_tpu.models.dcmht import DCMHTMethod

    cfg_model = config_from_dict({"model": {}}).model
    method = DCMHTMethod.from_config(cfg_model, output_dim=64)
    res = method.clip_cfg.image_resolution
    image = jnp.zeros((batch, res, res, 3), jnp.float32)
    text = jnp.zeros((batch, 32), jnp.int32)
    kpm = jnp.zeros((batch, 32), bool)
    variables = method.init_variables(
        jax.random.PRNGKey(0), {"image": image, "text": text, "key_padding_mask": kpm}
    )

    @jax.jit
    def fwd(v, i, t, k):
        return method.module.apply(v, i, t, k, train=False)

    _sync(fwd(variables, image, text, kpm))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, image, text, kpm)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


MAP_CHILD = r"""
import json, os, time, sys
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from cmh_tpu.ops.metrics import calc_map_k
rng = np.random.RandomState(1)
nq, nr, bits, classes = 5000, 110_000, 64, 80
qb = rng.choice([-1.,1.], size=(nq,bits)).astype(np.float32)
rb = rng.choice([-1.,1.], size=(nr,bits)).astype(np.float32)
ql = (rng.rand(nq,classes)>0.9).astype(np.float32); ql[:,0]=1
rl = (rng.rand(nr,classes)>0.9).astype(np.float32); rl[:nr//10,0]=1
calc_map_k(qb[:512], rb, ql[:512], rl)  # compile at steady-state chunk shape
t0 = time.perf_counter()
for _ in range(4):
    calc_map_k(qb, rb, ql, rl)
print(json.dumps({"map_time": time.perf_counter() - t0}))
"""


def bench_map_eval_subprocess(timeout_s=1500):
    """4-direction mAP@all at coco scale in a child (compile may be slow)."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", MAP_CHILD, CACHE_DIR],
            capture_output=True, timeout=timeout_s, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in proc.stdout.strip().splitlines()[::-1]:
            if line.startswith("{"):
                return json.loads(line)["map_time"]
    except Exception:
        pass
    return None


def main():
    def stage(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    _configure_jax()
    import jax

    stage("hamming kernel")
    hamming_rate = bench_hamming(bits=64)
    stage(f"hamming: {hamming_rate:.3e} cmp/s")
    stage("encode")
    encode_rate = bench_encode_best()
    stage(f"encode: {encode_rate:.1f} pairs/s")
    stage("map eval (subprocess)")
    map_time = bench_map_eval_subprocess()
    stage(f"map64 4dir: {map_time}")

    result = {
        "metric": "hamming_comparisons_per_sec_per_chip",
        "value": round(hamming_rate, 1),
        "unit": "pairs/s",
        "vs_baseline": round(hamming_rate / 1e8, 2),
        "extra": {
            "encode_pairs_per_sec_per_chip": round(encode_rate, 2),
            "map_at_all_eval_time_s_64bit_4dir_coco_scale": (
                round(map_time, 3) if map_time is not None else None
            ),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
