"""Retrieval serving: packed-code index with on-device top-k search.

The reference stops at dumping code matrices to ``.mat`` files
(runners/base.py:386-405); serving a hashing model in production needs an
index. ``RetrievalIndex`` keeps the gallery as 32-bit packed words (16× less
HBM than bf16 ±1 codes — 100M 256-bit items fit in 3.2 GB), computes query
Hamming distances with the Pallas XOR+popcount kernel, and returns exact
top-k neighbors via a distance+index composite key so ties break by gallery
insertion order (the same stable order the mAP metrics use).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.hamming_pallas import hamming_packed
from .ops.hashing import pack_bits


@functools.partial(jax.jit, static_argnames=("topk", "interpret"))
def _search(q_packed, g_packed, topk: int, interpret: bool = False):
    dist = hamming_packed(q_packed, g_packed, interpret=interpret).astype(
        jnp.int32
    )  # (Q, N)
    # lax.top_k breaks ties toward lower indices — exactly the stable
    # insertion-order tie-break the mAP metrics use
    neg_top, idx = jax.lax.top_k(-dist, topk)
    return -neg_top, idx


class RetrievalIndex:
    """Append-only binary-code index over one modality's gallery."""

    def __init__(self, bits: int):
        self.bits = bits
        self._chunks = []
        self._packed: Optional[jax.Array] = None
        self._count = 0

    def __len__(self) -> int:
        return self._count

    def add(self, codes) -> None:
        """Add ±1 codes (N, bits) to the gallery."""
        codes = jnp.asarray(codes, jnp.float32)
        assert codes.shape[1] == self.bits
        self._chunks.append(np.asarray(pack_bits(codes)))
        self._count += codes.shape[0]
        self._packed = None

    def _gallery(self) -> jax.Array:
        if self._packed is None:
            assert self._chunks, "index is empty"
            self._packed = jnp.asarray(np.concatenate(self._chunks, axis=0))
        return self._packed

    def search(self, query_codes, topk: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k by Hamming distance.

        Returns (distances (Q, topk) int, indices (Q, topk) int) in
        ascending-distance order, ties by insertion order.
        """
        q = jnp.asarray(query_codes, jnp.float32)
        assert q.shape[1] == self.bits
        qp = pack_bits(q)
        gallery = self._gallery()
        # Pallas compiles natively on TPU; CPU (tests) runs interpreted
        interpret = jax.default_backend() == "cpu"
        dist, idx = _search(qp, gallery, topk, interpret)
        return np.asarray(dist), np.asarray(idx)

    def save(self, path: str) -> None:
        np.savez(path, packed=np.concatenate(self._chunks, axis=0),
                 bits=self.bits, count=self._count)

    @classmethod
    def load(cls, path: str) -> "RetrievalIndex":
        data = np.load(path)
        index = cls(int(data["bits"]))
        index._chunks = [data["packed"]]
        index._count = int(data["count"])
        return index
