"""ctypes bindings for the native image-preprocessing lib (image_ops.cpp).

Built on demand with g++ via ``_build.NativeLib`` (no pybind11 in this
image; the C ABI + ctypes keeps the binding dependency-free). If the
toolchain is unavailable or the post-load self-test fails, the data pipeline
silently falls back to the PIL path in ``data/transforms.py``. The serving
scorer lives in the sibling ``hash_ops`` module.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from ._build import NativeLib

_HERE = os.path.dirname(os.path.abspath(__file__))

BILINEAR = 0
BICUBIC = 1


def _configure(lib: ctypes.CDLL) -> None:
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.crop_resize_normalize.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, f32p, ctypes.c_int,
    ]
    lib.crop_resize_normalize.restype = None
    lib.resize_normalize.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, f32p, ctypes.c_int,
    ]
    lib.resize_normalize.restype = None


def _self_test(lib) -> bool:
    """Sanity-check the loaded binary on a constant image: any interpolation
    of a constant field must reproduce the exact normalized value."""
    src = np.full((8, 8, 3), 128, dtype=np.uint8)
    mean = np.asarray([0.5, 0.5, 0.5], dtype=np.float32)
    std = np.asarray([0.25, 0.25, 0.25], dtype=np.float32)
    dst = np.empty((4, 4, 3), dtype=np.float32)
    lib.resize_normalize(
        _ptr(src, ctypes.c_uint8), 8, 8,
        _ptr(dst, ctypes.c_float), 4, 4, BILINEAR,
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float), 0,
    )
    expected = (128.0 / 255.0 - 0.5) / 0.25
    return bool(np.allclose(dst, expected, atol=1e-5))


_LIB = NativeLib(
    src=os.path.join(_HERE, "image_ops.cpp"),
    lib_path=os.path.join(_HERE, "libimage_ops.so"),
    configure=_configure,
    self_test=_self_test,
)


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    return _LIB.get()


def available() -> bool:
    return _LIB.available()


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def crop_resize_normalize(
    src: np.ndarray, box, size: int, mode: int, mean: np.ndarray,
    std: np.ndarray, flip: bool = False,
) -> np.ndarray:
    """uint8 HWC RGB → normalized float32 HWC; box = (y, x, h, w)."""
    lib = get_lib()
    assert lib is not None
    src = np.ascontiguousarray(src, dtype=np.uint8)
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    std = np.ascontiguousarray(std, dtype=np.float32)
    dst = np.empty((size, size, 3), dtype=np.float32)
    y, x, h, w = box
    lib.crop_resize_normalize(
        _ptr(src, ctypes.c_uint8), src.shape[0], src.shape[1],
        int(y), int(x), int(h), int(w),
        _ptr(dst, ctypes.c_float), size, size, int(mode),
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float), int(flip),
    )
    return dst


def resize_normalize(
    src: np.ndarray, size: int, mode: int, mean: np.ndarray, std: np.ndarray,
    flip: bool = False,
) -> np.ndarray:
    return crop_resize_normalize(
        src, (0, 0, src.shape[0], src.shape[1]), size, mode, mean, std, flip
    )
