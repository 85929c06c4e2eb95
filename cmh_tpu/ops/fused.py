"""Gate for the fused Pallas kernels in the CLIP compute path.

The fused attention / LayerNorm kernels replace XLA's lowering only where
they are known-safe and known-faster:

- real TPU backend (Mosaic compiled; off-TPU the kernels run in interpret
  mode, which is only used by the equivalence tests),
- single device: under a multi-device pjit mesh a ``pallas_call`` has no
  SPMD partitioning rule, so the mesh paths keep the einsum/flax lowering
  (the multi-chip dryrun and the CPU test mesh are unaffected).

``CMH_TPU_FUSED=0`` disables the kernels outright; ``CMH_TPU_FUSED=1``
forces them (used by the CPU equivalence tests via interpret mode).
"""

from __future__ import annotations

import os

import jax

_ENV = "CMH_TPU_FUSED"


def fused_kernels_ok() -> bool:
    mode = os.environ.get(_ENV, "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return jax.default_backend() == "tpu" and jax.device_count() == 1
