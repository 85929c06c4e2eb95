"""On-demand g++ build + ctypes load shared by the native libraries.

One ``NativeLib`` per shared object. The binary is never committed — it is
compiled locally with ``-march=native`` and sanity-checked after load, so a
stale or foreign-arch artifact can't silently poison (or crash) its caller;
every consumer has a pure-python fallback when the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Optional


class NativeLib:
    def __init__(
        self,
        src: str,
        lib_path: str,
        configure: Callable[[ctypes.CDLL], None],
        self_test: Callable[[ctypes.CDLL], bool],
    ) -> None:
        self.src = src
        self.lib_path = lib_path
        self._configure = configure
        self._self_test = self_test
        self._lock = threading.Lock()
        self._lib: Optional[ctypes.CDLL] = None
        self._failed = False

    def _build(self) -> bool:
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            self.src, "-o", self.lib_path, "-lpthread",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            try:  # -march=native can be unsupported in qemu-ish environments
                cmd.remove("-march=native")
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
                return True
            except Exception:
                return False

    def _load(self) -> Optional[ctypes.CDLL]:
        try:
            lib = ctypes.CDLL(self.lib_path)
        except OSError:
            return None
        self._configure(lib)
        return lib

    def _test(self, lib) -> bool:
        try:
            return bool(self._self_test(lib))
        except Exception:
            return False

    def get(self) -> Optional[ctypes.CDLL]:
        """Load (building if needed) the library; None if unavailable."""
        if self._lib is not None:
            return self._lib
        if self._failed:
            return None
        with self._lock:
            if self._lib is not None:
                return self._lib
            stale = not os.path.exists(self.lib_path) or (
                os.path.exists(self.src)
                and os.path.getmtime(self.src)
                > os.path.getmtime(self.lib_path)
            )
            if stale and not self._build():
                self._failed = True
                return None
            lib = self._load()
            if lib is None or not self._test(lib):
                # wrong-arch or corrupted binary: rebuild once from source
                try:
                    os.remove(self.lib_path)
                except OSError:
                    pass
                lib = self._load() if self._build() else None
                if lib is None or not self._test(lib):
                    self._failed = True
                    return None
            self._lib = lib
            return self._lib

    def available(self) -> bool:
        return self.get() is not None
