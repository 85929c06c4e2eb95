"""Seeding discipline.

The reference seeds python/numpy/torch/cuda with a single integer (default
1814, /root/reference/utils/set_seed.py:6-16). In JAX, device-side randomness
flows through explicit PRNG keys; host-side randomness (the query/train/
retrieval split and caption choice) still goes through ``numpy.random`` so
that the data split is bit-identical to the reference under the same seed
(the reference's split calls ``np.random.permutation`` right after
``np.random.seed`` — see dataset/builder.py:9-32 and runners/base.py:42).
"""

from __future__ import annotations

import random

import jax
import numpy as np

DEFAULT_SEED = 1814


def set_seed(seed: int = DEFAULT_SEED) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key.

    numpy's global Mersenne Twister is seeded exactly like the reference so
    that ``np.random.permutation`` in the dataset split consumes identical
    state and produces an identical query/train/retrieval partition.
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def key_iter(key: jax.Array):
    """Infinite iterator of fresh PRNG subkeys from a root key."""
    while True:
        key, sub = jax.random.split(key)
        yield sub
