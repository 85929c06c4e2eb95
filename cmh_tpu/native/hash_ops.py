"""ctypes bindings for the native packed-Hamming top-k (hash_ops.cpp).

CPU-side serving: exact top-k over pack_bits uint32 codes with the same
ascending-distance / lower-index tie order as the device path
(serving._search). Callers fall back to numpy when the toolchain is missing
— see ``serving.RetrievalIndex.search_cpu``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Tuple

import numpy as np

from ._build import NativeLib

_HERE = os.path.dirname(os.path.abspath(__file__))


def _configure(lib: ctypes.CDLL) -> None:
    lib.hamming_topk.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
    ]
    lib.hamming_topk.restype = None


def _self_test(lib: ctypes.CDLL) -> bool:
    """Known case with a distance tie: gallery rows 1 and 2 are both at
    distance 1 from the query — the lower index must win."""
    query = np.asarray([[0b1010]], dtype=np.uint32)
    gallery = np.asarray([[0b0101], [0b1011], [0b1000], [0b1010]],
                         dtype=np.uint32)
    dist, idx = _call(lib, query, gallery, 3)
    return (dist.tolist() == [[0, 1, 1]]) and (idx.tolist() == [[3, 1, 2]])


def _call(lib, query: np.ndarray, gallery: np.ndarray, k: int,
          n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    n_query, words = query.shape
    out_dist = np.empty((n_query, k), dtype=np.int32)
    out_idx = np.empty((n_query, k), dtype=np.int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.hamming_topk(
        query.ctypes.data_as(u32p), n_query,
        gallery.ctypes.data_as(u32p), gallery.shape[0],
        words, k,
        out_dist.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_threads,
    )
    return out_dist, out_idx


_LIB = NativeLib(
    src=os.path.join(_HERE, "hash_ops.cpp"),
    lib_path=os.path.join(_HERE, "libhash_ops.so"),
    configure=_configure,
    self_test=_self_test,
)


def available() -> bool:
    return _LIB.available()


def hamming_topk(query: np.ndarray, gallery: np.ndarray, k: int,
                 n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k Hamming over packed uint32 codes (Q, W) × (N, W).

    Returns (distances (Q, k) int32, indices (Q, k) int64), ascending
    distance, ties by lower gallery index. n_threads=0 → one thread per core.
    """
    lib = _LIB.get()
    assert lib is not None, "native hash_ops unavailable"
    query = np.ascontiguousarray(query, dtype=np.uint32)
    gallery = np.ascontiguousarray(gallery, dtype=np.uint32)
    assert query.ndim == 2 and gallery.ndim == 2
    assert query.shape[1] == gallery.shape[1]
    assert 0 < k <= gallery.shape[0]
    return _call(lib, query, gallery, k, n_threads)
