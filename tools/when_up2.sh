#!/bin/bash
# Second-shift watcher: when_up.sh's probe loop caps at 400 probes (~10h).
# If it gives up with the tunnel still down, this process takes over and
# re-launches the same battery with a fresh probe budget. If when_up.sh
# caught a live tunnel instead, this exits without ever touching it (only
# one process may hold the tunnel).
#
# Usage:  nohup bash tools/when_up2.sh > /tmp/when_up2.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
STATUS=/tmp/battery_status

for i in $(seq 1 2000); do
  if grep -q "^gave up" "$STATUS" 2>/dev/null; then
    echo "when_up2: taking over after give-up $(date)" >> "$STATUS"
    exec bash tools/when_up.sh
  fi
  # battery already started (or finished) — stand down
  grep -q "^tunnel up" "$STATUS" 2>/dev/null && exit 0
  sleep 60
done
