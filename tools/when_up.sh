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

echo "=== train-step profile (einsum path) $(date)" >> "$STATUS"
timeout 3000 python -u -m cmh_tpu.tools.profile_train > /tmp/batt_train0.log 2>&1
grep -E "train step|pairs/s" /tmp/batt_train0.log >> "$STATUS"

echo "=== train-step profile (CMH_TPU_FUSED=1) $(date)" >> "$STATUS"
CMH_TPU_FUSED=1 timeout 3000 python -u -m cmh_tpu.tools.profile_train > /tmp/batt_train1.log 2>&1
grep -E "train step|pairs/s" /tmp/batt_train1.log >> "$STATUS"

echo "=== bench.py $(date)" >> "$STATUS"
timeout 5500 python bench.py > /tmp/batt_bench.log 2>/tmp/batt_bench_err.log
tail -1 /tmp/batt_bench.log >> "$STATUS"

echo "=== done $(date)" >> "$STATUS"
