"""Hungarian (linear sum assignment) as a host callback usable inside jit.

DNPH's noise regularizer solves an O(B³) assignment between batch codes and
random ±1 vectors every step (/root/reference/models/DNPH/loss/b_reg.py:5-41,
scipy on detached numpy). XLA has no assignment primitive; the exact solver
stays on the host behind ``jax.pure_callback`` — the cost matrix is computed
on device, only the (B,) permutation crosses the host boundary, and XLA can
overlap the callback with independent device work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _solve_host(cost: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    _, col_ind = linear_sum_assignment(np.asarray(cost, dtype=np.float64))
    return col_ind.astype(np.int32)


def hungarian_assignment(cost: jax.Array) -> jax.Array:
    """Column index assigned to each row minimizing total cost. (B, B) → (B,)."""
    n = cost.shape[0]
    return jax.pure_callback(
        _solve_host,
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.lax.stop_gradient(cost),
        vmap_method="sequential",
    )


def greedy_assignment(cost: jax.Array) -> jax.Array:
    """Device-native greedy assignment: repeatedly take the globally
    cheapest remaining (row, col) pair. O(B) argmins over the B×B matrix —
    entirely inside jit, no host round-trip. Not guaranteed optimal like the
    Hungarian solve, but a valid permutation with near-minimal cost — ample
    for DNPH's noise-matching regularizer, and the only option on backends
    without host-callback support (e.g. the axon PJRT tunnel)."""
    n = cost.shape[0]
    big = jnp.float32(jnp.inf)

    def body(_, state):
        masked, assign = state
        flat = jnp.argmin(masked.reshape(-1))
        r, c = flat // n, flat % n
        assign = assign.at[r].set(c.astype(jnp.int32))
        masked = masked.at[r, :].set(big).at[:, c].set(big)
        return masked, assign

    _, assign = jax.lax.fori_loop(
        0, n, body, (cost.astype(jnp.float32), jnp.zeros((n,), jnp.int32))
    )
    return assign


def callbacks_supported() -> bool:
    """Host send/recv callbacks are unavailable on some PJRT backends
    (the axon TPU tunnel raises UNIMPLEMENTED at runtime)."""
    import os

    if os.environ.get("CMH_TPU_NO_CALLBACKS"):
        return False
    # the axon relay registers itself as platform "tpu" but rejects host
    # callbacks at runtime; its env markers are the only reliable signal
    if os.environ.get("PALLAS_AXON_POOL_IPS") or os.environ.get(
        "PALLAS_AXON_REMOTE_COMPILE"
    ):
        return False
    return jax.default_backend() in ("cpu", "gpu", "tpu")


def assign_noise(codes: jax.Array, noises: jax.Array,
                 method: str = "auto") -> jax.Array:
    """Reorder ``noises`` to minimize total L2 distance to ``codes``
    (reference gene_noise, b_reg.py:21-41). ``method``: "hungarian" (exact,
    host callback), "greedy" (on-device), or "auto" (hungarian where the
    backend supports callbacks)."""
    diff = codes[:, None, :] - noises[None, :, :]
    cost = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    if method == "auto":
        method = "hungarian" if callbacks_supported() else "greedy"
    if method == "hungarian":
        col = hungarian_assignment(cost)
    else:
        col = greedy_assignment(jax.lax.stop_gradient(cost))
    return jnp.take(noises, col, axis=0)


def rand_unit_rect(key: jax.Array, npoints: int, ndim: int) -> jax.Array:
    """Random ±1 vectors (reference rand_unit_rect, b_reg.py:5-17 — despite
    the name these are Rademacher corners, not unit-norm points)."""
    bits = jax.random.bernoulli(key, 0.5, (npoints, ndim))
    return bits.astype(jnp.float32) * 2.0 - 1.0
