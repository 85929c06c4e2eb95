"""Copy TPU-recovery battery results from /tmp into tools/artifacts/.

The measurement battery (tools/when_up.sh) writes its stage outputs under
/tmp, which does not survive the environment. This watcher polls the battery
status file and, as stages complete, persists their JSON results into
tools/artifacts/battery/ inside the repo — the round driver commits any
uncommitted files at round end, so results land in git even if no builder
session is alive when the tunnel recovers.

Run:  nohup python tools/collect_battery.py > /tmp/collect_battery.out 2>&1 &
"""

from __future__ import annotations

import json
import os
import shutil
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tools", "artifacts", "battery")
STATUS = "/tmp/battery_status"

# battery log → (artifact name, parse mode, status marker that proves the
# stage finished writing — the marker the battery appends when the NEXT
# stage starts, so a log is never copied mid-write)
STAGES = {
    "/tmp/batt_bench.log": (
        "bench_tpu.json", "last_json_line", "=== train-step profile (einsum"),
    "/tmp/batt_train0.log": (
        "train_profile_einsum.log", "copy", "=== train-step profile (CMH"),
    "/tmp/batt_train1.log": (
        "train_profile_fused.log", "copy", "=== epoch_ab"),
    "/tmp/batt_epoch_ab.log": (
        "epoch_ab_tpu_full.json", "last_json_line", "=== wide mAP kernel"),
    "/tmp/batt_wide.log": (
        "wide_kernel_check.log", "copy", "=== done"),
}


def last_json_line(path: str):
    try:
        with open(path) as f:
            lines = [l.strip() for l in f if l.strip()]
        for line in lines[::-1]:
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def persist(src: str, name: str, mode: str) -> bool:
    dst = os.path.join(OUT, name)
    if mode == "last_json_line":
        d = last_json_line(src)
        if d is None:
            return False
        # capture time INSIDE the JSON: file mtime becomes checkout time
        # after any clone, which would misdate the evidence
        d.setdefault("captured_at_utc", time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()))
        with open(dst, "w") as f:
            json.dump(d, f, indent=1)
        # the TPU epoch A/B additionally feeds bench.py's artifact extras
        if name == "epoch_ab_tpu_full.json" and d.get("speedup"):
            shutil.copyfile(dst, os.path.join(
                REPO, "tools", "artifacts", "epoch_ab_tpu_full.json"))
        return True
    if not os.path.exists(src) or os.path.getsize(src) == 0:
        return False
    shutil.copyfile(src, dst)
    return True


def main():
    os.makedirs(OUT, exist_ok=True)
    done = set()
    for _ in range(2000):  # ~28h at 50s — outlives any round
        status = ""
        try:
            with open(STATUS) as f:
                status = f.read()
        except Exception:
            pass
        with open(os.path.join(OUT, "status.txt"), "w") as f:
            f.write(status)
        for src, (name, mode, marker) in STAGES.items():
            if src in done or marker not in status:
                continue
            if persist(src, name, mode):
                done.add(src)
                print(f"persisted {src} -> {name}", flush=True)
        if "=== done" in status and len(done) == len(STAGES):
            print("battery complete, all stages persisted", flush=True)
            return
        time.sleep(50)


if __name__ == "__main__":
    main()
