"""Device-mesh data parallelism.

TPU-native replacement for the reference's DDP stack (process-per-GPU
mp.spawn + NCCL init + DistributedSampler + SyncBatchNorm + eval-buffer
all_reduce — /root/reference/main.py:38-51, runners/base.py:82-112,172-197,
244-264). JAX is single-program multi-device: one process drives the whole
mesh, the *global* batch is sharded over the ``dp`` axis by jit input
shardings, params stay replicated, and XLA inserts the gradient psum and the
eval-code all-gather on ICI — no process groups, no rendezvous, no manual
collectives.

Semantic note vs DDP: the reference computes pairwise losses within each
rank's shard and all-reduces gradients (so cross-shard pairs are lost);
sharding the batch inside one jitted program keeps the loss mathematically
identical to single-device training at the global batch size — XLA gathers
what the pairwise similarity matrices need. The mesh also carries a ``tp``
axis hook for tensor-parallel sharding of the backbone, unused by default
(the reference has no TP either — SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    tp: int = 1,
) -> Mesh:
    """(dp, tp) mesh over the available devices; tp=1 by default."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % tp != 0:  # explicit: asserts vanish under python -O
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    arr = np.asarray(devs).reshape(n // tp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def check_batch_divisible(batch_size: int, mesh: Mesh, what: str = "batch_size"):
    """Fail with a named error instead of a deep GSPMD 'not divisible'
    crash on the first sharded step: batches shard over the dp axis, so
    every batch size must be a multiple of it (e.g. the reference protocol's
    batch 100 cannot shard over 8 devices)."""
    dp = mesh.shape[DP_AXIS]
    if batch_size % dp != 0:
        raise ValueError(
            f"{what}={batch_size} is not divisible by the mesh dp axis "
            f"({dp} devices) — choose a multiple (e.g. "
            f"{-(-batch_size // dp) * dp})"
        )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; everything else replicated."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, split along the batch axis."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
