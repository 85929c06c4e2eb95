"""Worker for the 2-process jax.distributed rendezvous test.

Runs the REAL product path (main.maybe_init_distributed) — not a mock —
then proves live cross-process communication with a coordination-service
barrier and an all-device broadcast. Launched twice (process_id 0 and 1)
by tests/test_parallel.py.
"""

import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import main as cli  # noqa: E402
from cmh_tpu.config import ConfigNode  # noqa: E402


def run(process_id: int, port: int) -> None:
    cfg = ConfigNode({"run": {
        "multi_host": True,
        "distributed_addr": "127.0.0.1",
        "distributed_port": port,
        "num_processes": 2,
        "process_id": process_id,
    }})
    assert cli.maybe_init_distributed(cfg) is True
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == process_id
    assert jax.local_device_count() == 1
    assert jax.device_count() == 2, "global devices must span both processes"

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("rendezvous-test")
    import numpy as np

    # process 0's value must land on process 1 — real data over the wire
    v = multihost_utils.broadcast_one_to_all(
        np.int32(41 + jax.process_index()))
    assert int(v) == 41, int(v)
    print(f"@RENDEZVOUS_OK@ pid={process_id}", flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]), int(sys.argv[2]))
