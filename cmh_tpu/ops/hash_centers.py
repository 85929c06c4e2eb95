"""Hash-center utilities (CSQ-style Hadamard centers) and TwDH targets.

The reference ships per-dataset center tensors as torch pickles
(/root/reference/data/transformer/TwDH/**, loaded in TwDH.__init__,
models/TwDH/TwDH.py:35-54). This module can (a) load those pickles for
parity and (b) generate CSQ Hadamard centers natively when no asset exists,
plus the per-sample multi-label center targets and softmax-pair conversion
used by the TwDH loss (TwDH.py:192-230).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hadamard_matrix(n: int) -> np.ndarray:
    """Sylvester construction; n must be a power of two."""
    assert n > 0 and (n & (n - 1)) == 0, f"{n} is not a power of two"
    h = np.ones((1, 1), dtype=np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def generate_hash_centers(n_class: int, n_bits: int, seed: int = 0) -> np.ndarray:
    """CSQ centers: Hadamard rows (and their negations) when they suffice,
    Bernoulli ±1 rows otherwise."""
    rng = np.random.RandomState(seed)
    if (n_bits & (n_bits - 1)) == 0 and n_bits > 0:
        ha = hadamard_matrix(n_bits)
        rows = np.concatenate([ha, -ha], axis=0)
        if n_class <= rows.shape[0]:
            return rows[:n_class].astype(np.float32)
    return (rng.randint(0, 2, size=(n_class, n_bits)) * 2 - 1).astype(np.float32)


def load_center_file(path: str) -> np.ndarray:
    """Load a torch-pickled center/transform tensor (reference data assets)."""
    import torch

    try:
        t = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        import warnings

        warnings.warn(
            f"{path} is not a weights-only pickle; falling back to unsafe "
            "torch.load(weights_only=False)"
        )
        t = torch.load(path, map_location="cpu", weights_only=False)
    return np.asarray(t.float().numpy(), dtype=np.float32)


def hash_center_multilabels(
    labels: jax.Array, centers: jax.Array, rng_key: Optional[jax.Array] = None
) -> jax.Array:
    """Per-sample target center: sign of the sum of the positive labels'
    centers; exact-zero bits break ties with one shared random ±1 vector
    (reference hash_center_multilables, TwDH.py:192-214 — vectorized: the
    reference loops over the batch; sign(mean) == sign(sum))."""
    labels = labels.astype(jnp.float32)
    s = labels @ centers.astype(jnp.float32)
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    random_pm = (
        jax.random.randint(rng_key, (centers.shape[1],), 0, 2).astype(jnp.float32)
        * 2.0 - 1.0
    )
    return jnp.where(s > 0, 1.0, jnp.where(s < 0, -1.0, random_pm[None, :]))


def hash_convert(hash_label: jax.Array) -> jax.Array:
    """±1 codes (B, K) → softmax-pair one-hot targets (B, 2K):
    bit −1 → (1, 0), bit +1 → (0, 1) (reference hash_convert,
    TwDH.py:216-230)."""
    h = (hash_label > 0).astype(jnp.float32)
    pairs = jnp.stack([1.0 - h, h], axis=-1)  # (B, K, 2)
    return pairs.reshape(hash_label.shape[0], -1)


@jax.custom_vjp
def bce_probs(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """torch.nn.BCELoss on probabilities.

    Mirrors the torch primitive on BOTH passes: the forward clamps each log
    at -100; the backward is ``(p - y) / clamp_min(p*(1-p), 1e-12)`` (aten
    binary_cross_entropy_backward), NOT the separated ``y/p - (1-y)/(1-p)``
    form. The custom backward matters beyond parity: when a softmax-pair
    hash saturates to exactly 0/1 (TwDH's 32-bit short codes do), the
    separated form autodiffs to ``0 * inf = NaN`` through the log clamp,
    while torch's fused quotient stays finite.
    """
    log_p = jnp.maximum(jnp.log(jnp.maximum(probs, 0.0)), -100.0)
    log_1mp = jnp.maximum(jnp.log(jnp.maximum(1.0 - probs, 0.0)), -100.0)
    return -jnp.mean(targets * log_p + (1.0 - targets) * log_1mp)


def _bce_probs_fwd(probs, targets):
    return bce_probs(probs, targets), (probs, targets)


def _bce_probs_bwd(res, g):
    probs, targets = res
    denom = jnp.maximum(probs * (1.0 - probs), 1e-12)
    grad_p = g * (probs - targets) / denom / probs.size
    # true target-side gradient (matches autodiff of the clamped forward):
    # d/dy[-mean(y·log p + (1−y)·log(1−p))] = (log(1−p) − log p)/N — current
    # losses pass label-derived constants, but a future loss differentiating
    # through targets must not get silent zeros
    log_p = jnp.maximum(jnp.log(jnp.maximum(probs, 0.0)), -100.0)
    log_1mp = jnp.maximum(jnp.log(jnp.maximum(1.0 - probs, 0.0)), -100.0)
    grad_t = g * (log_1mp - log_p) / probs.size
    return grad_p, grad_t


bce_probs.defvjp(_bce_probs_fwd, _bce_probs_bwd)
