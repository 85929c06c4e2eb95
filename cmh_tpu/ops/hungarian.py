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


def assign_noise(codes: jax.Array, noises: jax.Array) -> jax.Array:
    """Reorder ``noises`` to minimize total L2 distance to ``codes``
    (reference gene_noise, b_reg.py:21-41)."""
    diff = codes[:, None, :] - noises[None, :, :]
    cost = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    col = hungarian_assignment(cost)
    return jnp.take(noises, col, axis=0)


def rand_unit_rect(key: jax.Array, npoints: int, ndim: int) -> jax.Array:
    """Random ±1 vectors (reference rand_unit_rect, b_reg.py:5-17 — despite
    the name these are Rademacher corners, not unit-norm points)."""
    bits = jax.random.bernoulli(key, 0.5, (npoints, ndim))
    return bits.astype(jnp.float32) * 2.0 - 1.0
