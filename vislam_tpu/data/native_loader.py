"""ctypes binding for the native C++ loader (native/vt_loader.cpp).

Compiles the shared library lazily on first use (g++, libpng) and caches it
next to the source. Every entry point has a pure-Python fallback, so the
package works even without a toolchain; the native path removes PNG decode
and CSV parse from the GIL and prefetches frames ahead of the consumer
(role of the reference's C++ ImageReader/GroundTruth, done asynchronously).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libvtloader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "vt_loader.cpp")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO_PATH) or (
                os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO_PATH, _SRC_PATH, "-lpng", "-lpthread"],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO_PATH)
            lib.vt_load_csv.restype = ctypes.c_int
            lib.vt_load_csv.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ]
            lib.vt_load_png_gray.restype = ctypes.c_int
            lib.vt_load_png_gray.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.vt_free.argtypes = [ctypes.c_void_p]
            lib.vt_prefetch_create.restype = ctypes.c_void_p
            lib.vt_prefetch_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.vt_prefetch_get.restype = ctypes.c_int
            lib.vt_prefetch_get.argtypes = [
                ctypes.c_void_p, ctypes.c_long,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.vt_prefetch_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_csv(path: str) -> np.ndarray:
    """Comma CSV -> float64 (rows, cols); '#' comments skipped."""
    lib = _get_lib()
    if lib is None:
        from vislam_tpu.data.euroc import _read_csv

        return _read_csv(path)
    out = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    rc = lib.vt_load_csv(path.encode(), ctypes.byref(out),
                         ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"vt_load_csv({path}) failed rc={rc}")
    n = rows.value * cols.value
    arr = np.ctypeslib.as_array(out, shape=(rows.value, cols.value)).copy()
    lib.vt_free(out)
    del n
    return arr


def load_png_gray(path: str) -> np.ndarray:
    """Grayscale PNG -> uint8 (H, W)."""
    lib = _get_lib()
    if lib is None:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(path)
        return img
    out = ctypes.POINTER(ctypes.c_ubyte)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.vt_load_png_gray(path.encode(), ctypes.byref(out),
                              ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"vt_load_png_gray({path}) failed rc={rc}")
    arr = np.ctypeslib.as_array(out, shape=(h.value, w.value)).copy()
    lib.vt_free(out)
    return arr


class NativePrefetcher:
    """Threaded native decode-ahead over an ordered path list."""

    def __init__(self, paths, depth: int = 8, threads: int = 2):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.vt_prefetch_create(arr, len(self._paths), depth, threads)
        self._closed = False

    def get(self, idx: int) -> np.ndarray:
        out = ctypes.POINTER(ctypes.c_ubyte)()
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.vt_prefetch_get(self._handle, idx, ctypes.byref(out),
                                       ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            raise IOError(f"prefetch_get({idx}) failed")
        arr = np.ctypeslib.as_array(out, shape=(h.value, w.value)).copy()
        self._lib.vt_free(out)
        return arr

    def close(self):
        if not self._closed:
            self._lib.vt_prefetch_destroy(self._handle)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
