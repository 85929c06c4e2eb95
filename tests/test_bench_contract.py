"""bench.py output contract: exactly one JSON line on stdout, always.

The driver parses the last stdout line as JSON after every round; a wedged
TPU tunnel (observed: PJRT handshake hangs uninterruptibly) must degrade to
null/0 fields, never to a hang or a missing line. BENCH_BUDGET_S=5 expires
the global deadline immediately so every stage yields its default.
"""

import json
import os
import subprocess
import sys


def test_bench_prints_one_json_line_even_with_no_budget():
    env = dict(os.environ, BENCH_BUDGET_S="5", JAX_PLATFORMS="cpu",
               CMH_TPU_PLATFORM="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    d = json.loads(lines[0])
    assert d["metric"] == "hamming_comparisons_per_sec_per_chip"
    assert set(d) >= {"value", "unit", "vs_baseline", "extra"}
    assert "train_step_pairs_per_sec_per_chip" in d["extra"]
    # tunnel-independent committed artifacts ride along in every line
    assert d["extra"]["artifact_ref_epoch_s_torch_cpu_full_scale"] > 60
