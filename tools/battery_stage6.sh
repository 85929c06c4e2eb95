#!/bin/bash
# Round-4 follow-on battery stage: every method runs on the REAL chip.
#
# Round 1's only on-TPU method was DCMHT; this stage runs one real train
# step + full 4-direction eval for all 8 registered methods (tiny CLIP,
# synthetic data) via cmh_tpu.tools.all_methods_smoke — one process per
# method so a wedged tunnel is killable per stage — and persists a JSON
# array artifact. Waits for battery stage 5 so only one process holds the
# tunnel.
#
# Usage:  nohup bash tools/battery_stage6.sh > /tmp/stage6.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
STATUS=/tmp/battery_status
OUT=tools/artifacts/battery/all_methods_tpu.json

for i in $(seq 1 780); do
  grep -q "^=== stage5 done" "$STATUS" 2>/dev/null && break
  sleep 90
done
grep -q "^=== stage5 done" "$STATUS" || {
  echo "stage6: stage5 never finished $(date)" >> "$STATUS"; exit 1; }

echo "=== stage6 all-methods on-chip smoke $(date)" >> "$STATUS"
mkdir -p tools/artifacts/battery
echo "[" > "$OUT.tmp"
first=1
for m in DCMHT MITH DSPH DNPH TwDH DIMCH UMoED Baseline; do
  line=$(timeout 1500 python -m cmh_tpu.tools.all_methods_smoke --method "$m" \
           2>/tmp/batt_smoke_err_$m.log | grep '^@SMOKE@' | tail -1)
  json="${line#@SMOKE@}"
  [ -z "$json" ] && json="{\"method\": \"$m\", \"ok\": false, \"error\": \"no output (timeout/crash)\"}"
  [ $first -eq 0 ] && echo "," >> "$OUT.tmp"
  first=0
  echo "$json" >> "$OUT.tmp"
  echo "stage6 $m: $json" >> "$STATUS"
done
echo "]" >> "$OUT.tmp"
mv "$OUT.tmp" "$OUT"
echo "=== stage6 done $(date)" >> "$STATUS"
