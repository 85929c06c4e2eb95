"""Contract tests for the epoch A/B measurement tool (tools/epoch_ab.py).

The tool is evidence-bearing (its JSON feeds the BASELINE.md >=5x epoch
claim and the committed tools/artifacts/ref_epoch_full.json), so its CLI
contract is pinned here: the output JSON schema, the steady-state ratio
convention (reference epoch 0 dropped — ours excludes compile via a warm
epoch, so the reference's torch lazy-init epoch must not inflate the
ratio), and the cached-artifact param guard.
"""

import json
import os
import subprocess
import sys

import pytest

ENV = {**os.environ, "CMH_TPU_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"}
CMD = [sys.executable, "-u", "-m", "cmh_tpu.tools.epoch_ab"]


def run_tool(*args, timeout=420):
    return subprocess.run(
        CMD + list(args), capture_output=True, text=True, timeout=timeout,
        env=ENV, cwd="/root/repo",
    )


@pytest.mark.slow
def test_tiny_ours_only_json_contract():
    proc = run_tool("--scale", "tiny", "--epochs", "1", "--skip-reference",
                    "--train-num", "32", "--query-num", "16", "--batch", "16")
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["scale"] == "tiny"
    assert out["backend_ours"] == "cpu"
    assert out["train_num"] == 32 and out["batch"] == 16
    assert out["ours_epoch_s"] > 0
    assert out["ours_epoch_times_s"] and all(
        t > 0 for t in out["ours_epoch_times_s"])
    # no reference side requested → ratio fields are null, not absent
    assert out["ref_epoch_s"] is None and out["speedup"] is None


def test_ref_artifact_param_mismatch_fails_loud(tmp_path):
    art = tmp_path / "ref.json"
    art.write_text(json.dumps({
        "params": {"scale": "tiny", "res": 32, "train_num": 999,
                   "query_num": 16, "batch": 16, "epochs": 1},
        "ref_epoch_times_s": [1.0],
    }))
    proc = run_tool("--scale", "tiny", "--epochs", "1", "--ref-only",
                    "--train-num", "32", "--query-num", "16",
                    "--batch", "16", "--ref-artifact", str(art),
                    "--skip-reference")
    assert proc.returncode != 0
    assert "cached reference artifact measured" in proc.stderr


def test_ref_artifact_reuse_in_ref_only_mode(tmp_path):
    art = tmp_path / "ref.json"
    art.write_text(json.dumps({
        "params": {"scale": "tiny", "res": 32, "train_num": 32,
                   "query_num": 16, "batch": 16, "epochs": 2},
        "ref_epoch_times_s": [30.0, 10.0],
    }))
    proc = run_tool("--scale", "tiny", "--epochs", "2", "--ref-only",
                    "--train-num", "32", "--query-num", "16",
                    "--batch", "16", "--ref-artifact", str(art))
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["ref_source"] == "artifact"
    assert out["ref_epoch_times_s"] == [30.0, 10.0]


def test_committed_full_scale_artifact_is_loadable():
    path = "/root/repo/tools/artifacts/ref_epoch_full.json"
    with open(path) as f:
        art = json.load(f)
    assert art["params"]["scale"] == "full"
    assert art["params"]["train_num"] >= 1000, (
        "VERDICT r2 item 2 requires a >=1000-item epoch")
    assert art["params"]["batch"] >= 100
    assert len(art["ref_epoch_times_s"]) == art["params"]["epochs"]
    assert all(t > 60 for t in art["ref_epoch_times_s"])
