"""One-off: validate the uint16 (>126-bit) counting-rank Pallas path on the
real TPU (Mosaic must accept uint16 loads — interpret mode can't prove that)
and time it at coco scale for the record.

Run: python tools/validate_map_long_tpu.py [bits]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from cmh_tpu.ops.map_bucketed import calc_map_k_4dir
from cmh_tpu.ops.map_pallas import calc_map_k_4dir_pallas


def main(bits=128):
    print(f"backend: {jax.default_backend()}, bits: {bits}")
    rng = np.random.RandomState(3)

    # correctness at awkward sizes vs the torch-oracle-verified XLA path
    nq, nr, classes = 37, 1111, 8
    qi = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    qt = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    ri = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    rt = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    ql = (rng.rand(nq, classes) > 0.6).astype(np.float32)
    ql[:, 0] = 1
    rl = (rng.rand(nr, classes) > 0.6).astype(np.float32)
    rl[: nr // 3, 0] = 1
    # VP = bits+2 lane groups grow linearly with width — wide codes need
    # the production tiles (map_bucketed._pallas_tiles: tq=8 to 1022 bits,
    # 4 to 2046, 2 to 4094 — TwDH's shipped 1024/2048-bit long centers
    # included), and their oracle must be the chunked-argsort route (the
    # XLA bucketed path stops at 256 bits)
    from cmh_tpu.ops.map_bucketed import _pallas_tiles

    wide = bits + 1 > 256
    tq, tn, _ = _pallas_tiles(bits)
    if wide:
        from cmh_tpu.ops.metrics import calc_map_k

        want = tuple(
            float(calc_map_k(q, r, ql, rl, None))
            for q, r in ((qi, rt), (qt, ri), (qi, ri), (qt, rt))
        )
    else:
        want = calc_map_k_4dir(qi, qt, ri, rt, ql, rl, None, chunk=32)
    got = calc_map_k_4dir_pallas(qi, qt, ri, rt, ql, rl, None,
                                 chunk=32, tq=tq, tn=tn)
    err = max(abs(a - b) for a, b in zip(got, want))
    print(f"correctness: got={got}\n             want={want}\n  max err={err:.2e}")
    assert err < (1e-5 if wide else 2e-6), "Pallas path diverges on TPU"

    # coco-scale timing (5000 x 110k)
    nq, nr, classes = 5000, 110_000, 80
    qi = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    qt = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    ri = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    rt = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    ql = (rng.rand(nq, classes) > 0.9).astype(np.float32)
    ql[:, 0] = 1
    rl = (rng.rand(nr, classes) > 0.9).astype(np.float32)
    rl[: nr // 10, 0] = 1

    chunk = _pallas_tiles(bits)[2]  # the production query chunk

    def run():
        return calc_map_k_4dir_pallas(qi, qt, ri, rt, ql, rl, None,
                                      chunk=chunk, tq=tq, tn=tn)

    run()  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    print(f"{bits}-bit 4-dir coco-scale eval: {sorted(times)[1]:.2f}s "
          f"(runs: {[round(t, 2) for t in times]})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
