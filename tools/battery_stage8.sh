#!/bin/bash
# Round-4 follow-on battery stage: serving top-k selection A/B on the REAL
# chip.
#
# Round 4 replaced the device serving selection (lax.top_k over each
# (Q, block) tile — a full per-row sort whose HBM traffic dominated the
# 10M-item bench at 3.97e8 cmp/s, BELOW the host CPU scorer) with a
# counting-rank two-pass (histogram threshold + cumsum/searchsorted
# collection, serving._topk_counting). CPU-tested bit-equal; this stage
# measures both strategies at the bench shape on real hardware, asserts
# equality there too, and persists the JSON. Waits for stage 7 so only one
# process holds the tunnel.
#
# Usage:  nohup bash tools/battery_stage8.sh > /tmp/stage8.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
STATUS=/tmp/battery_status

for i in $(seq 1 900); do
  grep -q "^=== stage7 done" "$STATUS" 2>/dev/null && break
  sleep 90
done
grep -q "^=== stage7 done" "$STATUS" || {
  echo "stage8: stage7 never finished $(date)" >> "$STATUS"; exit 1; }

echo "=== stage8 serving select A/B $(date)" >> "$STATUS"
timeout 3600 python - > /tmp/batt_serving_ab.log 2>&1 <<'PYEOF'
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from cmh_tpu.ops.hashing import pack_bits
from cmh_tpu.serving import (_DEVICE_BLOCK, _topk_counting, _topk_scan)

n, q, bits, topk, runs = 10_000_000, 64, 64, 100, 3
rng = np.random.RandomState(0)
gp = jnp.asarray(rng.randint(0, 2**32, size=(n, 2), dtype=np.uint64)
                 .astype(np.uint32))
queries = [pack_bits(jnp.asarray(
    rng.choice([-1.0, 1.0], size=(q, bits)).astype(np.float32)))
    for _ in range(runs + 1)]

fns = {
    "sort": jax.jit(lambda qp, g: _topk_scan(
        qp, g, topk, _DEVICE_BLOCK, False, 0, n)),
    "counting": jax.jit(lambda qp, g: _topk_counting(
        qp, g, topk, _DEVICE_BLOCK, False, 0, n, bits)),
}
out = {"n": n, "q": q, "bits": bits, "topk": topk}
results = {}
for name, fn in fns.items():
    d, i = fn(queries[-1], gp)  # warmup/compile
    float(jnp.sum(d) + jnp.sum(i))
    times = []
    for r in range(runs):  # vary inputs: identical calls can be cached
        t0 = time.perf_counter()
        d, i = fn(queries[r], gp)
        host = float(jnp.sum(d) + jnp.sum(i))  # force a real value fetch
        times.append(time.perf_counter() - t0)
    results[name] = (np.asarray(d), np.asarray(i))
    med = sorted(times)[len(times) // 2]
    out[name + "_s"] = round(med, 4)
    out[name + "_cmp_per_sec"] = round(q * n / med, 1)
equal = bool((results["sort"][0] == results["counting"][0]).all()
             and (results["sort"][1] == results["counting"][1]).all())
out["bit_equal_on_chip"] = equal
out["speedup_counting_vs_sort"] = round(
    out["sort_s"] / out["counting_s"], 2)
print(json.dumps(out))
assert equal
PYEOF
tail -1 /tmp/batt_serving_ab.log >> "$STATUS"
mkdir -p tools/artifacts/battery
cp /tmp/batt_serving_ab.log tools/artifacts/battery/serving_select_ab.json
echo "=== stage8 done $(date)" >> "$STATUS"
