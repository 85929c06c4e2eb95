"""Worker for the 2-process multi-host DP TRAINING test.

Each process owns 4 virtual CPU devices; the pair rendezvous through the
real product path (main.maybe_init_distributed) into one 8-device global
mesh, then runs a full tiny DCMHT epoch with the actual trainer — global
batches sharded over dp ACROSS the process boundary, gradient psum riding
gloo. Process 0 dumps the resulting params for the launcher to compare
against a single-process 8-device run of the identical config.
"""

import os
import sys

pid = int(sys.argv[1])
port = int(sys.argv[2])
outdir = sys.argv[3]

# 4 local devices BEFORE jax initializes; 2 processes → 8 global
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import main as cli  # noqa: E402
from cmh_tpu.config import ConfigNode  # noqa: E402
from util_methods import tiny_trainer  # noqa: E402


def run() -> None:
    assert cli.maybe_init_distributed(ConfigNode({"run": {
        "multi_host": True,
        "distributed_addr": "127.0.0.1",
        "distributed_port": port,
        "num_processes": 2,
        "process_id": pid,
    }})) is True
    assert jax.process_count() == 2 and jax.device_count() == 8

    from pathlib import Path

    tr = tiny_trainer(
        Path(outdir) / f"p{pid}", "DCMHT", "DCMHTTrainer",
        model_extra={"hash_func": "softmax"},
        run_extra={"distribute": True, "shuffle": False},
    )
    assert tr.mesh is not None and tr.mesh.devices.size == 8
    tr.train_epoch(0)

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("epoch-done")
    if pid == 0:
        # params are dp-replicated → fully addressable on this process
        leaves = jax.tree_util.tree_leaves(tr.state.params)
        np.savez(os.path.join(outdir, "params_mh.npz"),
                 *[np.asarray(l) for l in leaves])
    print(f"@DP_TRAIN_OK@ pid={pid} step={int(tr.state.step)}", flush=True)


if __name__ == "__main__":
    run()
