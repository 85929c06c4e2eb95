#!/bin/bash
# Round-4 follow-on battery stage: remaining code-width lanes on the REAL chip.
#
# Battery stage 4 validates the f32 wide path at 512 bits; this stage covers
# the two counting-rank lanes that still have never compiled under Mosaic on
# real hardware: the uint16 lane (126-255 bits — TwDH-adjacent widths; Mosaic
# must accept uint16 loads, interpret mode can't prove that) via
# tools/validate_map_long_tpu.py at 128 bits, and the top of the f32 wide
# path at 1022 bits (its ceiling — TwDH's 1024-bit long codes route to
# chunked argsort just above it). Waits for stage 6 so only one process
# holds the tunnel; persists its own artifacts.
#
# Usage:  nohup bash tools/battery_stage7.sh > /tmp/stage7.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
STATUS=/tmp/battery_status

for i in $(seq 1 840); do
  grep -q "^=== stage6 done" "$STATUS" 2>/dev/null && break
  sleep 90
done
grep -q "^=== stage6 done" "$STATUS" || {
  echo "stage7: stage6 never finished $(date)" >> "$STATUS"; exit 1; }

mkdir -p tools/artifacts/battery
echo "=== stage7 code-width lanes on-chip $(date)" >> "$STATUS"
timeout 3000 python tools/validate_map_long_tpu.py 128 \
  > /tmp/batt_width128.log 2>&1
tail -2 /tmp/batt_width128.log >> "$STATUS"
cp /tmp/batt_width128.log tools/artifacts/battery/map_uint16_128bit_tpu.log

timeout 3600 python tools/validate_map_long_tpu.py 1022 \
  > /tmp/batt_width1022.log 2>&1
tail -2 /tmp/batt_width1022.log >> "$STATUS"
cp /tmp/batt_width1022.log tools/artifacts/battery/map_wide_1022bit_tpu.log
echo "=== stage7 done $(date)" >> "$STATUS"
