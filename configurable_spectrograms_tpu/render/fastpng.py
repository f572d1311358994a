"""ctypes bindings for the native fast PNG encoder (with PIL fallback).

``native/fastpng.cpp`` writes RGB PNGs with a fixed Up-filter strategy and
a caller-chosen zlib level -- profiling showed PIL's adaptive per-scanline
filtering dominating figure save time on this host.  The binding releases
the GIL for the whole encode (ctypes does this automatically), letting
batch-driver worker threads overlap PNG encoding with device readback.

The shared library is compiled on first use when missing (g++ ships in the
image); any failure degrades silently to PIL's encoder so the package
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "fastpng.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libfastpng.so")


@functools.lru_cache(maxsize=1)
def _load() -> ctypes.CDLL | None:
    if not os.path.exists(_LIB) and os.path.exists(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-o", _LIB, _SRC, "-lz"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB):
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.fastpng_write_rgb.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_char_p,
    ]
    lib.fastpng_write_rgb.restype = ctypes.c_int32
    return lib


def native_available() -> bool:
    return _load() is not None


def write_png_rgb(array: np.ndarray, path: str, compress_level: int = 3) -> bool:
    """Write an (H, W, 3) uint8 array as a PNG; returns False on any failure.

    Callers fall back to PIL when this returns False.
    """
    lib = _load()
    if lib is None:
        return False
    a = np.ascontiguousarray(array, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        return False
    h, w = a.shape[:2]
    rc = lib.fastpng_write_rgb(
        a.ctypes.data_as(ctypes.c_char_p),
        np.int32(w),
        np.int32(h),
        np.int32(compress_level),
        path.encode(),
    )
    return rc == 0
