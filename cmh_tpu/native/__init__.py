"""ctypes bindings + on-demand build for the native image-preprocessing lib.

Builds ``libimage_ops.so`` with g++ on first use (no pybind11 in this image;
the C ABI + ctypes keeps the binding dependency-free). The binary is never
committed — it is compiled locally with ``-march=native`` and sanity-checked
after load, so a stale or foreign-arch artifact can't silently poison (or
crash) the data pipeline. If the toolchain is unavailable or the self-test
fails, the pipeline silently falls back to the PIL path in
``data/transforms.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "image_ops.cpp")
_LIB = os.path.join(_HERE, "libimage_ops.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

BILINEAR = 0
BICUBIC = 1


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # -march=native can be unsupported in qemu-ish environments
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def _load() -> Optional[ctypes.CDLL]:
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
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
    return lib


def _self_test(lib) -> bool:
    """Sanity-check the loaded binary on a constant image: any interpolation
    of a constant field must reproduce the exact normalized value."""
    try:
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
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        stale = not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        )
        if stale and not _build():
            _build_failed = True
            return None
        lib = _load()
        if lib is None or not _self_test(lib):
            # wrong-arch or corrupted binary: rebuild once from source
            try:
                os.remove(_LIB)
            except OSError:
                pass
            lib = _load() if _build() else None
            if lib is None or not _self_test(lib):
                _build_failed = True
                return None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


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
