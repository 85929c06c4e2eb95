#!/bin/bash
# Round-5 on-chip battery: the five VERDICT-r4 measurements, serially, each
# in a killable subprocess (a wedged tunnel hangs INSIDE the PJRT C call —
# only process kill works). Artifacts land under tools/artifacts/battery/
# so the round-end auto-commit persists them even with no session alive.
#
# Stages:
#  1 serving forensics      — bench_serving_device with select-path + raw
#                             per-run times (the r04 9× spread, item 1)
#  2 eval codegen decompose — profile_encode product/encode-only/combined
#                             at batch 256 (item 2)
#  3 train-step profile     — profile_train at batch 256 vs 100 (item 6)
#  4 wide mAP 1024/2048     — validate_map_long_tpu at TwDH's shipped long
#                             center widths, correctness + coco-scale time
#                             (item 3)
#  5 epoch A/B at 10k items — ours-side true-protocol epoch cost (item 5)
#
# Usage:  nohup bash tools/battery_r05.sh > /tmp/battery_r05.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
ART=tools/artifacts/battery
STATUS=/tmp/battery_r05_status
mkdir -p "$ART"
echo "=== battery r05 start $(date -u +%FT%TZ)" > "$STATUS"

stamp() { python - "$1" <<'EOF'
import json, sys, time
p = sys.argv[1]
try:
    d = json.load(open(p))
except Exception:
    sys.exit(0)
if isinstance(d, dict) and "captured_at_utc" not in d:
    d["captured_at_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    json.dump(d, open(p, "w"), indent=1)
EOF
}

# --- stage 1: serving forensics --------------------------------------
echo "=== stage1 serving forensics $(date -u +%TZ)" >> "$STATUS"
timeout 2400 python - <<'EOF' > /tmp/r05_s1.out 2>/tmp/r05_s1.err
import json, sys, os
sys.path.insert(0, os.getcwd())
import bench
bench._configure_jax()
out = bench.bench_serving_device(runs=8)
print("@R@" + json.dumps(out))
EOF
grep '^@R@' /tmp/r05_s1.out | tail -1 | cut -c4- > "$ART/serving_forensics_r05.json" || true
stamp "$ART/serving_forensics_r05.json"
echo "stage1 rc=$? $(tail -c 300 /tmp/r05_s1.out 2>/dev/null)" >> "$STATUS"

# --- stage 2: eval codegen decomposition ------------------------------
echo "=== stage2 profile_encode $(date -u +%TZ)" >> "$STATUS"
timeout 2400 python -m cmh_tpu.tools.profile_encode --batch 256 \
  > /tmp/r05_s2.out 2>/tmp/r05_s2.err
grep '^{' /tmp/r05_s2.out | tail -1 > "$ART/profile_encode_r05.json" || true
stamp "$ART/profile_encode_r05.json"
cp /tmp/r05_s2.out "$ART/profile_encode_r05.log" 2>/dev/null || true
echo "stage2 done $(date -u +%TZ)" >> "$STATUS"

# --- stage 3: train-step profile at batch 256 vs 100 ------------------
echo "=== stage3 profile_train b256/b100 $(date -u +%TZ)" >> "$STATUS"
timeout 2400 python -m cmh_tpu.tools.profile_train --batch 256 \
  > "$ART/train_profile_b256_r05.log" 2>/tmp/r05_s3a.err || true
timeout 1200 python -m cmh_tpu.tools.profile_train --batch 100 \
  > "$ART/train_profile_b100_r05.log" 2>/tmp/r05_s3b.err || true
echo "stage3 done $(date -u +%TZ)" >> "$STATUS"

# --- stage 4: wide mAP at TwDH long-center widths ----------------------
echo "=== stage4 wide map 1024/2048 $(date -u +%TZ)" >> "$STATUS"
for B in 1024 2048; do
  timeout 3600 python tools/validate_map_long_tpu.py "$B" \
    > "$ART/map_wide_${B}bit_r05.log" 2>&1 || true
done
echo "stage4 done $(date -u +%TZ)" >> "$STATUS"

# --- stage 5: ours-side epoch at the TRUE 10k protocol ------------------
echo "=== stage5 epoch 10k $(date -u +%TZ)" >> "$STATUS"
timeout 5400 python -m cmh_tpu.tools.epoch_ab --scale full \
  --train-num 10000 --query-num 500 --skip-reference --epochs 2 \
  > /tmp/r05_s5.out 2>/tmp/r05_s5.err
grep '^{' /tmp/r05_s5.out | tail -1 > "$ART/epoch_ab_tpu_10k.json" || true
stamp "$ART/epoch_ab_tpu_10k.json"
echo "stage5 done $(date -u +%TZ)" >> "$STATUS"
echo "=== battery r05 complete $(date -u +%FT%TZ)" >> "$STATUS"
