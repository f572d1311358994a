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


def _src_digest() -> str:
    import hashlib

    try:
        with open(_SRC, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()[:12]
    except OSError:
        return "nosrc"


def _host_tag() -> str:
    """A short digest of this host's CPU capabilities.

    The build uses ``-march=native``, so a cached ``.so`` is only valid on
    a CPU with the same instruction sets: a cache shared across hosts
    (NFS home, warm container layer) must not hand an AVX-512 build to an
    older CPU -- SIGILL there kills the process and cannot degrade to the
    PIL fallback.  The tag folds the cpuinfo flag set (plus the machine
    arch) into the cached filename so every CPU generation gets its own
    build.
    """
    import hashlib
    import platform

    basis = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    basis += ":" + line.split(":", 1)[1].strip()
                    break
    except OSError:
        basis += ":" + platform.processor()
    return hashlib.sha256(basis.encode()).hexdigest()[:10]


def _lib_path() -> str:
    """Per-user cache location for the compiled library.

    A pre-built ``native/libfastpng.so`` next to the source is honored
    when it is at least as new as the source (make-style mtime check --
    an artifact left by an older checkout must not shadow a rewritten
    encoder); otherwise the artifact lives under ``~/.cache`` (or
    ``CST_NATIVE_CACHE_DIR``) so first-use compilation works on read-only
    installs and never writes into the package tree.  The cached name
    embeds a source digest, so editing the C++ invalidates stale builds
    instead of silently loading them.
    """
    packaged = os.path.join(_NATIVE_DIR, "libfastpng.so")
    if os.path.exists(packaged):
        try:
            fresh = not os.path.exists(_SRC) or os.path.getmtime(packaged) >= os.path.getmtime(_SRC)
        except OSError:
            fresh = True
        if fresh:
            return packaged
    cache_root = os.environ.get("CST_NATIVE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "configurable_spectrograms_tpu"
    )
    return os.path.join(cache_root, f"libfastpng-{_src_digest()}-{_host_tag()}.so")


def _compile(lib_path: str) -> bool:
    """Compile the encoder to *lib_path* atomically.

    The compiler writes to a pid-unique temporary which is then
    ``os.rename``d into place, so concurrent processes (ProcessPool
    workers, parallel CLIs) never dlopen a torn library -- each process
    either sees the complete artifact or compiles its own and the last
    rename wins (identical content).
    """
    try:
        os.makedirs(os.path.dirname(lib_path), exist_ok=True)
    except OSError:
        return False
    tmp = f"{lib_path}.tmp.{os.getpid()}"
    # Prefer libdeflate (~2-3x faster whole-buffer deflate + hw CRC);
    # fall back to plain zlib where it isn't installed.
    base = ["g++", "-O3", "-fPIC", "-shared", "-o", tmp, _SRC]
    # The library is built per-host on first use (never shipped), so
    # -march=native is safe and lets the compiler vectorize the filter
    # subtraction and widened run/match scans with whatever the host has
    # (AVX2/AVX-512); fall back through -mssse3 (vectorized RGBA->RGB
    # repack, baseline on any x86-64 since ~2006) to plain builds where
    # a flag or libdeflate is unsupported.
    for extra in (
        ["-march=native", "-DFASTPNG_USE_LIBDEFLATE", "-ldeflate"],
        ["-mssse3", "-DFASTPNG_USE_LIBDEFLATE", "-ldeflate"],
        ["-DFASTPNG_USE_LIBDEFLATE", "-ldeflate"],
        ["-march=native", "-lz"],
        ["-mssse3", "-lz"],
        ["-lz"],
    ):
        try:
            subprocess.run(base + extra, check=True, capture_output=True, timeout=120)
            os.rename(tmp, lib_path)
            return True
        except Exception:
            try:
                os.remove(tmp)
            except OSError:
                pass
            continue
    return False


@functools.lru_cache(maxsize=1)
def _load() -> ctypes.CDLL | None:
    _LIB = _lib_path()
    if not os.path.exists(_LIB) and os.path.exists(_SRC):
        if not _compile(_LIB):
            return None
    if not os.path.exists(_LIB):
        return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.fastpng_write_v2
    except OSError:
        return None
    except AttributeError:
        # Stale library from an older source revision: rebuild once.
        try:
            os.remove(_LIB)
        except OSError:
            return None
        _load.cache_clear()
        return _load()
    lib.fastpng_write_v2.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_char_p,
    ]
    lib.fastpng_write_v2.restype = ctypes.c_int32
    try:
        blit = lib.fastpng_blit_runs
    except AttributeError:
        # Stale cached library predating the blit kernel: the source digest
        # in the cache key normally prevents this, but a packaged .so can
        # shadow it.  write_png_rgb still works; blit_runs reports
        # unavailable.
        lib._has_blit = False
        return lib
    blit.argtypes = [
        ctypes.c_void_p,  # idx
        ctypes.c_int64,   # idx_row_stride
        ctypes.c_void_p,  # t_idx
        ctypes.c_void_p,  # x_ok
        ctypes.c_void_p,  # sel
        ctypes.c_void_p,  # starts
        ctypes.c_void_p,  # counts
        ctypes.c_int32,   # n_runs
        ctypes.c_void_p,  # lut
        ctypes.c_void_p,  # out
        ctypes.c_int64,   # out_row_stride
        ctypes.c_int32,   # oh
        ctypes.c_int32,   # ow
    ]
    blit.restype = ctypes.c_int32
    lib._has_blit = True
    try:
        blend = lib.fastpng_blend_tile
    except AttributeError:
        lib._has_blend = False
        return lib
    blend.argtypes = [
        ctypes.c_void_p,  # canvas
        ctypes.c_int64,   # canvas_stride
        ctypes.c_int32,   # H
        ctypes.c_int32,   # W
        ctypes.c_void_p,  # tile
        ctypes.c_int32,   # tw
        ctypes.c_int32,   # th
        ctypes.c_int32,   # x0
        ctypes.c_int32,   # y0
    ]
    blend.restype = ctypes.c_int32
    # The kernel implements Pillow >=9.1's precise-division RGBA blend.
    # Older Pillows paste with the legacy MULDIV255 pair, which differs
    # on ~24.5% of (mask, canvas, tile) byte triples (native/fastpng.cpp)
    # -- on such a Pillow the native path would silently diverge from the
    # Image.paste fallback, so a one-shot probe compares both over a
    # dense byte sweep and keeps whichever contract Pillow actually has.
    lib._has_blend = _blend_matches_pillow(blend)
    return lib


def _blend_matches_pillow(blend) -> bool:
    """True when the native blend is byte-equal to this Pillow's paste."""
    try:
        from PIL import Image
    except ImportError:
        return False
    rng = np.random.default_rng(0)
    h = w = 64
    canvas = rng.integers(0, 256, (h, w, 4), np.uint8)
    tile = rng.integers(0, 256, (h, w, 4), np.uint8)
    tile[..., 3] = np.arange(h * w, dtype=np.uint32).reshape(h, w) % 256
    pil = Image.fromarray(canvas.copy(), "RGBA")
    pil.paste(Image.fromarray(tile, "RGBA"), (0, 0), Image.fromarray(tile, "RGBA"))
    native = np.ascontiguousarray(canvas.copy())
    rc = blend(
        native.ctypes.data,
        np.int64(native.strides[0]),
        np.int32(h),
        np.int32(w),
        np.ascontiguousarray(tile).ctypes.data,
        np.int32(w),
        np.int32(h),
        np.int32(0),
        np.int32(0),
    )
    return rc == 0 and np.array_equal(native, np.asarray(pil))


def blit_available() -> bool:
    """True when the loaded library exports the run-blit kernel.

    Distinct from :func:`native_available`: a stale packaged .so can
    encode PNGs but lack ``fastpng_blit_runs``; callers that allocate a
    destination buffer for :func:`blit_runs` should check THIS first so
    the allocation isn't wasted on a guaranteed-False call.
    """
    lib = _load()
    return lib is not None and bool(getattr(lib, "_has_blit", False))


def native_available() -> bool:
    return _load() is not None


def write_png_rgb(array: np.ndarray, path: str, compress_level: int = 3) -> bool:
    """Write an (H, W, 3|4) uint8 array as an RGB PNG; False on any failure.

    RGBA input has its alpha dropped inside the encoder, so a shared RGBA
    canvas encodes with zero Python-side copies.  Callers fall back to PIL
    when this returns False.
    """
    lib = _load()
    if lib is None:
        return False
    a = np.ascontiguousarray(array, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        return False
    h, w = a.shape[:2]
    rc = lib.fastpng_write_v2(
        a.ctypes.data_as(ctypes.c_char_p),
        np.int32(w),
        np.int32(h),
        np.int32(a.shape[2]),
        np.int32(compress_level),
        path.encode(),
    )
    return rc == 0


def blit_runs(
    idx: np.ndarray,
    t_idx: np.ndarray,
    x_ok: np.ndarray,
    sel: np.ndarray,
    starts: np.ndarray,
    counts: np.ndarray,
    lut_ext: np.ndarray,
    out: np.ndarray,
) -> bool:
    """Native gather+color+replicate into *out* (an RGBA canvas rect).

    The single-pass C++ twin of the numpy tail of
    :func:`configurable_spectrograms_tpu.render.tile.resample_indices`
    (pure integer/uint8 ops, so output is bit-identical).  Returns False
    whenever the fast path cannot run -- callers keep the numpy tail as
    the fallback.
    """
    lib = _load()
    if lib is None or not getattr(lib, "_has_blit", False):
        return False
    oh, ow = int(out.shape[0]), int(out.shape[1])
    if oh <= 0 or ow <= 0:
        return True
    if (
        idx.dtype != np.uint8
        # A negative row stride (e.g. an idx[::-1] view) would make the C
        # kernel's size_t row-offset arithmetic formally undefined; a zero
        # stride (broadcast views) is fine once rows are bounds-checked.
        or idx.strides[0] < 0
        or idx.strides[1] != 1
        or out.dtype != np.uint8
        or out.shape[2] != 4
        or out.strides[1] != 4
        or out.strides[2] != 1
    ):
        return False
    t_idx = np.ascontiguousarray(t_idx, np.int32)
    x_ok_u8 = np.ascontiguousarray(x_ok, np.uint8)
    if len(t_idx) < ow or len(x_ok_u8) < ow:
        return False
    sel = np.ascontiguousarray(sel, np.int32)
    # The C kernel has no bounds checks; an out-of-range row/column from a
    # contract-violating caller would be a silent out-of-bounds read where
    # the numpy tail raises IndexError.  Two tiny int32 scans guard it.
    used_t = t_idx[:ow]
    if used_t.size and (int(used_t.min()) < 0 or int(used_t.max()) >= idx.shape[0]):
        return False
    if sel.size and (int(sel.min()) < 0 or int(sel.max()) >= idx.shape[1]):
        return False
    starts = np.ascontiguousarray(starts, np.int32)
    counts = np.ascontiguousarray(counts, np.int32)
    lut_ext = np.ascontiguousarray(lut_ext, np.uint8)
    if lut_ext.shape != (257, 4):
        return False
    rc = lib.fastpng_blit_runs(
        idx.ctypes.data,
        np.int64(idx.strides[0]),
        t_idx.ctypes.data,
        x_ok_u8.ctypes.data,
        sel.ctypes.data,
        starts.ctypes.data,
        counts.ctypes.data,
        np.int32(len(sel)),
        lut_ext.ctypes.data,
        out.ctypes.data,
        np.int64(out.strides[0]),
        np.int32(oh),
        np.int32(ow),
    )
    return rc == 0


def blend_available() -> bool:
    """True when the loaded library exports the text-tile blend kernel."""
    lib = _load()
    return lib is not None and bool(getattr(lib, "_has_blend", False))


def canvas_blender(canvas: np.ndarray):
    """A per-canvas fast-paste closure, or ``None`` when unavailable.

    :func:`blend_tile` revalidates the canvas and rebuilds numpy scalar
    arguments on every call (~15 µs); a figure pastes ~120 cached text
    tiles into ONE canvas, so validating once and caching the canvas's
    ctypes fields cuts each paste to one ctypes invoke (~4 µs measured).
    The returned ``paste(tile, x, y) -> bool`` applies the same tile
    checks as :func:`blend_tile`; identical arithmetic, same kernel.
    """
    lib = _load()
    if lib is None or not getattr(lib, "_has_blend", False):
        return None
    if (
        canvas.dtype != np.uint8
        or canvas.ndim != 3
        or canvas.shape[2] != 4
        or canvas.strides[0] < 0
        or canvas.strides[1] != 4
        or canvas.strides[2] != 1
    ):
        return None
    blend = lib.fastpng_blend_tile
    data = canvas.ctypes.data
    stride = int(canvas.strides[0])
    H, W = int(canvas.shape[0]), int(canvas.shape[1])

    # ``_pinned`` keeps the canvas buffer alive for the closure's lifetime
    # (the cached ``data`` pointer alone would not).
    def paste(tile: np.ndarray, x: int, y: int, _pinned=canvas) -> bool:
        if (
            tile.dtype != np.uint8
            or tile.ndim != 3
            or tile.shape[2] != 4
            or not tile.flags.c_contiguous
        ):
            return False
        return blend(data, stride, H, W, tile.ctypes.data, tile.shape[1], tile.shape[0], x, y) == 0

    return paste


def blend_tile(canvas: np.ndarray, tile: np.ndarray, x: int, y: int) -> bool:
    """Alpha-blend a small RGBA *tile* into *canvas* at (*x*, *y*).

    The arithmetic twin of Pillow's ``Image.paste(tile, (x, y), tile)``
    for RGBA targets (the precise-division BLEND on every channel, alpha
    included), minus PIL's per-call dispatch -- output bytes are
    identical (pinned by tests/test_native_blit.py's exhaustive triple
    sweep).  Returns False whenever the fast path cannot run; callers
    keep ``Image.paste`` as the fallback.
    """
    lib = _load()
    if lib is None or not getattr(lib, "_has_blend", False):
        return False
    if (
        canvas.dtype != np.uint8
        or canvas.ndim != 3
        or canvas.shape[2] != 4
        # Negative/transposed strides would break the C kernel's size_t
        # row arithmetic; the figure canvas is always C-contiguous rows.
        or canvas.strides[0] < 0
        or canvas.strides[1] != 4
        or canvas.strides[2] != 1
    ):
        return False
    if tile.dtype != np.uint8 or tile.ndim != 3 or tile.shape[2] != 4 or not tile.flags.c_contiguous:
        return False
    rc = lib.fastpng_blend_tile(
        canvas.ctypes.data,
        np.int64(canvas.strides[0]),
        np.int32(canvas.shape[0]),
        np.int32(canvas.shape[1]),
        tile.ctypes.data,
        np.int32(tile.shape[1]),
        np.int32(tile.shape[0]),
        np.int32(x),
        np.int32(y),
    )
    return rc == 0
