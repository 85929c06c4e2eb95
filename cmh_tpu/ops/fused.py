"""Gate for the fused Pallas kernels in the CLIP compute path.

The fused attention / LayerNorm kernels replace XLA's lowering only where
they are known-safe and known-faster:

- real TPU backend (Mosaic compiled; off-TPU the kernels run in interpret
  mode, which is only used by the equivalence tests),
- single device: under a multi-device pjit mesh a ``pallas_call`` has no
  SPMD partitioning rule, so the mesh paths keep the einsum/flax lowering
  (the multi-chip dryrun and the CPU test mesh are unaffected).

``CMH_TPU_FUSED=1`` enables the kernels (single real TPU only, or the CPU
equivalence tests via interpret mode); ``CMH_TPU_FUSED=0`` — or unset —
keeps XLA's lowering. Default OFF: the kernels measured perf-NEUTRAL
end-to-end on v5e (every variant tried lands on the same chip-bound time;
CLAUDE.md "Chip compute reality"), so the einsum path stays the
battle-tested default and the kernels remain an opt-in foundation
(they do eliminate the 30MB/layer fp32 softmax HBM round-trip).
"""

from __future__ import annotations

import os

import jax

_ENV = "CMH_TPU_FUSED"


_FORCE_INTERPRET = False    # test hook


def fused_kernels_ok() -> bool:
    mode = os.environ.get(_ENV, "0")
    if mode != "1":
        return False
    backend = jax.default_backend()
    if backend == "tpu":
        # a pallas_call has no SPMD partitioning rule — mesh runs keep
        # the einsum/flax lowering
        return jax.device_count() == 1
    # CPU: interpret-mode kernels, used only by the equivalence tests
    return backend == "cpu"


def interpret_mode() -> bool:
    """Shared by the kernel modules: compiled Mosaic on real TPU,
    interpret mode elsewhere (the CPU equivalence tests)."""
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() != "tpu"
