#!/bin/bash
# TPU-recovery measurement battery.
#
# The axon tunnel can wedge (PJRT handshake hangs uninterruptibly inside the
# C call — see CLAUDE.md "Round-2 session-2 state"). This script polls with a
# killable subprocess probe and, the moment the tunnel answers, runs the
# serialized measurement battery unattended. Only ONE process may hold the
# tunnel at a time, so every stage runs strictly after the previous one.
#
# Usage:  nohup bash tools/when_up.sh > /tmp/when_up.out 2>&1 &
# Status: cat /tmp/battery_status
set -u
cd "$(dirname "$0")/.."
STATUS=/tmp/battery_status

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; float(jnp.sum(jnp.arange(4)))" >/dev/null 2>&1
}

for i in $(seq 1 400); do
  if probe; then
    echo "tunnel up at $(date)" > "$STATUS"
    break
  fi
  echo "probe $i down $(date)" > "$STATUS"
  sleep 90
done
probe || { echo "gave up: tunnel never came back $(date)" >> "$STATUS"; exit 1; }

# 1) the driver metric first — BENCH_r03 evidence
echo "=== bench.py $(date)" >> "$STATUS"
timeout 5500 python bench.py > /tmp/batt_bench.log 2>/tmp/batt_bench_err.log
tail -1 /tmp/batt_bench.log >> "$STATUS"

# 2) train-step profiles (flat-BertAdam number, fused A/B)
echo "=== train-step profile (einsum path) $(date)" >> "$STATUS"
timeout 3000 python -u -m cmh_tpu.tools.profile_train > /tmp/batt_train0.log 2>&1
grep -E "train step|pairs/s" /tmp/batt_train0.log >> "$STATUS"

echo "=== train-step profile (CMH_TPU_FUSED=1) $(date)" >> "$STATUS"
CMH_TPU_FUSED=1 timeout 3000 python -u -m cmh_tpu.tools.profile_train > /tmp/batt_train1.log 2>&1
grep -E "train step|pairs/s" /tmp/batt_train1.log >> "$STATUS"

# 3) full-scale epoch A/B ours side (torch side cached in the committed
# artifact; first compile of the scan-chunked programs can be 10-25 min)
if [ -f tools/artifacts/ref_epoch_full.json ]; then
  echo "=== epoch_ab full (ours on TPU, cached ref artifact) $(date)" >> "$STATUS"
  timeout 7200 python -u -m cmh_tpu.tools.epoch_ab --scale full --epochs 2 \
    --ref-artifact tools/artifacts/ref_epoch_full.json \
    > /tmp/batt_epoch_ab.log 2>&1
  tail -1 /tmp/batt_epoch_ab.log >> "$STATUS"
else
  echo "=== epoch_ab skipped: tools/artifacts/ref_epoch_full.json missing $(date)" >> "$STATUS"
fi

# 4) wide-code (512-bit) counting-rank kernel on-chip validation vs the
# chunked-argsort oracle — new in round 3, only interpret-tested off-chip
echo "=== wide mAP kernel on-chip check $(date)" >> "$STATUS"
timeout 3600 python - > /tmp/batt_wide.log 2>&1 <<'PYEOF'
import numpy as np
from cmh_tpu.ops.map_pallas import calc_map_k_4dir_pallas
from cmh_tpu.ops.metrics import calc_map_k
import time
rng = np.random.RandomState(0)
nq, nr, bits, classes = 256, 4096, 512, 8
qi, qt, ri, rt = (rng.choice([-1.0, 1.0], size=s).astype(np.float32)
                  for s in [(nq, bits)] * 2 + [(nr, bits)] * 2)
ql = (rng.rand(nq, classes) > 0.5).astype(np.float32); ql[:, 0] = 1
rl = (rng.rand(nr, classes) > 0.5).astype(np.float32); rl[: nr // 3, 0] = 1
got = calc_map_k_4dir_pallas(qi, qt, ri, rt, ql, rl, None,
                             chunk=256, tq=8, tn=64)
t0 = time.perf_counter()
got = calc_map_k_4dir_pallas(qi, qt, ri, rt, ql, rl, None,
                             chunk=256, tq=8, tn=64)
dt = time.perf_counter() - t0
want = [calc_map_k(q, r, ql, rl, None)
        for q, r in ((qi, rt), (qt, ri), (qi, ri), (qt, rt))]
err = max(abs(g - w) for g, w in zip(got, want))
print(f"wide-ok err={err:.2e} warm_s={dt:.3f} got={got}")
assert err < 1e-5
PYEOF
tail -1 /tmp/batt_wide.log >> "$STATUS"

echo "=== done $(date)" >> "$STATUS"
