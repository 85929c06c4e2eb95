#!/bin/bash
# Round-5 follow-up battery (runs after battery_r05.sh completes): confirm
# the serving collect fix on chip and capture the counting-select per-pass
# breakdown. Stages:
#  6 wait for battery_r05.sh to finish (status file sentinel)
#  7 serving forensics with the restored cumsum collect (expect ~0.26-0.3s
#    per run / ~2.4e9 cmp/s — the r04 number of record)
#  8 profile_serving_select — score vs hist vs full counting breakdown,
#    to see where the remaining non-scoring milliseconds go
#
# Usage:  nohup bash tools/battery_r05b.sh > /tmp/battery_r05b.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
ART=tools/artifacts/battery
STATUS=/tmp/battery_r05b_status
mkdir -p "$ART"
echo "=== battery r05b start $(date -u +%FT%TZ)" > "$STATUS"

# --- stage 6: wait for the main battery -------------------------------
while ! grep -q "battery r05 complete" /tmp/battery_r05_status 2>/dev/null; do
  sleep 60
done
echo "=== stage6 main battery complete $(date -u +%TZ)" >> "$STATUS"

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

# --- stage 7: serving forensics, cumsum collect ------------------------
echo "=== stage7 serving cumsum forensics $(date -u +%TZ)" >> "$STATUS"
timeout 2400 python - <<'EOF' > /tmp/r05_s7.out 2>/tmp/r05_s7.err
import json, sys, os
sys.path.insert(0, os.getcwd())
import bench
bench._configure_jax()
out = bench.bench_serving_device(runs=8)
print("@R@" + json.dumps(out))
EOF
grep '^@R@' /tmp/r05_s7.out | tail -1 | cut -c4- \
  > "$ART/serving_cumsum_confirm_r05.json" || true
stamp "$ART/serving_cumsum_confirm_r05.json"
echo "stage7 rc=$? $(tail -c 300 /tmp/r05_s7.out 2>/dev/null)" >> "$STATUS"

# --- stage 8: counting-select per-pass breakdown ------------------------
echo "=== stage8 profile_serving_select $(date -u +%TZ)" >> "$STATUS"
timeout 2400 python tools/profile_serving_select.py \
  > /tmp/r05_s8.out 2>/tmp/r05_s8.err
grep '^{' /tmp/r05_s8.out | tail -1 > "$ART/serving_select_profile_r05.json" || true
stamp "$ART/serving_select_profile_r05.json"
cp /tmp/r05_s8.out "$ART/serving_select_profile_r05.log" 2>/dev/null || true
echo "stage8 done $(date -u +%TZ)" >> "$STATUS"
echo "=== battery r05b complete $(date -u +%FT%TZ)" >> "$STATUS"
