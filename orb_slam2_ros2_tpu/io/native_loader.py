"""ctypes bridge to the native prefetching PNG decoder (native/dataloader.cpp).

Builds the shared library on first use (g++, libpng) and falls back to PIL
when the toolchain or libpng is unavailable — the framework stays pure-Python
capable, the native path removes image decode from the tracker's critical
path with a multithreaded in-order prefetch ring.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libslamio.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.dl_next.restype = ctypes.c_int
    lib.dl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    lib.dl_decode_one.restype = ctypes.c_int
    lib.dl_decode_one.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def decode_png(path: str) -> Optional[np.ndarray]:
    """Synchronous native decode → f32 grayscale [H, W]; None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    cap = 4096 * 4096
    buf = np.empty(cap, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    n = lib.dl_decode_one(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        ctypes.byref(h), ctypes.byref(w),
    )
    if n <= 0:
        return None
    return buf[:n].reshape(h.value, w.value).copy()


class PrefetchingLoader:
    """In-order multithreaded decode of a path list (bounded ring)."""

    def __init__(self, paths: List[str], n_threads: int = 4, depth: int = 8,
                 capacity: int = 4096 * 4096):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = lib.dl_create(arr, len(paths), n_threads, depth)
        if not self._handle:
            raise RuntimeError("dl_create failed")
        self._cap = capacity
        self._buf = np.empty(capacity, np.float32)
        self.shape: Optional[Tuple[int, int]] = None
        self._n = len(paths)
        self._i = 0

    def __len__(self):
        return self._n

    def next(self, shape: Tuple[int, int]) -> Optional[np.ndarray]:
        """Blocking fetch of the next frame reshaped to ``shape``."""
        if self._i >= self._n:
            return None
        n = self._lib.dl_next(
            self._handle, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), self._cap
        )
        self._i += 1
        if n <= 0:
            return None
        h, w = shape
        if n != h * w:
            return None
        return self._buf[:n].reshape(h, w).copy()

    def close(self):
        if self._handle:
            self._lib.dl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
