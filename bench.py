"""Benchmark: runs on one real TPU chip, prints ONE JSON line.

Primary metric: packed-code Hamming throughput (query×gallery comparisons/sec
per chip) at coco eval scale (5000 queries × 110k gallery, 64-bit codes) —
the driver's north-star target is ≥100M cmp/s/chip (BASELINE.md), so
``vs_baseline`` = value / 1e8. Extra fields report the encode throughput
(image+text pairs/sec/chip on the ViT-B/32 DCMHT forward) and the full
4-direction mAP@all eval wall time at 16 and 64 bits.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: TPU programs (especially the big eval sorts)
# compile once per machine, not once per process
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(x):
    jax.block_until_ready(x)
    return x


def bench_hamming(num_q=5000, num_r=110_000, bits=64, iters=5):
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
    return num_q * num_r / dt, dt


def bench_map_eval(num_q=5000, num_r=110_000, bits=64, classes=80):
    from cmh_tpu.ops.metrics import calc_map_k

    rng = np.random.RandomState(1)
    qb = rng.choice([-1.0, 1.0], size=(num_q, bits)).astype(np.float32)
    rb = rng.choice([-1.0, 1.0], size=(num_r, bits)).astype(np.float32)
    ql = (rng.rand(num_q, classes) > 0.9).astype(np.float32)
    rl = (rng.rand(num_r, classes) > 0.9).astype(np.float32)
    ql[:, 0] = 1
    rl[: num_r // 10, 0] = 1
    calc_map_k(qb[:256], rb, ql[:256], rl)  # compile
    t0 = time.perf_counter()
    # 4 directions like the reference valid loop (runners/base.py:317-321)
    for _ in range(4):
        calc_map_k(qb, rb, ql, rl)
    return time.perf_counter() - t0


def bench_encode(batch=64, iters=5):
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


def main():
    import sys

    def stage(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    stage("hamming kernel")
    hamming_rate, _ = bench_hamming(bits=64)
    stage(f"hamming: {hamming_rate:.3e} cmp/s")
    map_time_64 = bench_map_eval(bits=64)
    stage(f"map64: {map_time_64:.2f}s")
    map_time_16 = bench_map_eval(bits=16)
    stage(f"map16: {map_time_16:.2f}s")
    encode_rate = bench_encode()
    stage(f"encode: {encode_rate:.1f} pairs/s")

    result = {
        "metric": "hamming_comparisons_per_sec_per_chip",
        "value": round(hamming_rate, 1),
        "unit": "pairs/s",
        "vs_baseline": round(hamming_rate / 1e8, 2),
        "extra": {
            "encode_pairs_per_sec_per_chip": round(encode_rate, 2),
            "map_at_all_eval_time_s_64bit_4dir_coco_scale": round(map_time_64, 3),
            "map_at_all_eval_time_s_16bit_4dir_coco_scale": round(map_time_16, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
