"""Native (C++) host-side image ops with transparent numpy fallback.

Builds ``image_ops.cpp`` with the system g++ on first import (cached by
source hash next to the package; rebuilt only when the source changes)
and exposes ctypes wrappers. If no compiler is available the module
stays disabled and :mod:`painter_tpu.data.transforms` keeps its numpy
paths — behavior is identical either way (parity-tested), only speed
differs.
"""
from __future__ import annotations

import ctypes
import functools
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "image_ops.cpp")
_LIB = None
_FAILED = False  # memoize build/load failure: don't re-run g++ per call
_DISABLED = os.environ.get("PAINTER_TPU_NO_NATIVE", "") == "1"
_FORCED_OFF = False


def _cache_dir() -> str:
    d = os.environ.get("PAINTER_TPU_NATIVE_CACHE")
    if not d:
        d = os.path.join(os.path.dirname(__file__), "_cache")
    os.makedirs(d, exist_ok=True)
    return d


def _host_tag() -> str:
    """Cache key component for the host ISA: -march=native binaries are
    not portable, and cache dirs can live on shared filesystems."""
    import platform
    bits = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits += line
                    break
    except OSError:
        pass
    return hashlib.sha256(bits.encode()).hexdigest()[:8]


def _build() -> str:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16] + "_" + _host_tag()
    out = os.path.join(_cache_dir(), f"image_ops_{tag}.so")
    if os.path.exists(out):
        return out
    # Build into the cache dir itself so the final os.replace is a
    # same-filesystem rename (os.replace across mounts raises EXDEV,
    # which _load() would swallow — silently disabling native ops).
    fd, tmp = tempfile.mkstemp(dir=_cache_dir(), suffix=".so.tmp")
    os.close(fd)
    try:
        base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-fno-math-errno", _SRC, "-o", tmp]
        try:  # vectorize for the build host; portable fallback
            subprocess.run(base[:1] + ["-march=native"] + base[1:],
                           check=True, capture_output=True)
        except subprocess.CalledProcessError:
            subprocess.run(base, check=True, capture_output=True)
        os.replace(tmp, out)  # atomic: concurrent builders race safely
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out


def _load():
    global _LIB, _FAILED
    if _DISABLED or _FORCED_OFF or _FAILED:
        return None
    if _LIB is not None:
        return _LIB
    try:
        lib = ctypes.CDLL(_build())
    except Exception:  # no compiler / build failure -> numpy fallback
        _FAILED = True
        return None
    i64, i32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.color_jitter.argtypes = [f32p, i64, i64, i32p, f32p]
    lib.normalize_u8.argtypes = [u8p, f32p, i64, i64, f32p, f32p]
    lib.normalize_f32.argtypes = [f32p, f32p, i64, i64, f32p, f32p]
    lib.resize_hwc.argtypes = [f32p, i64, i64, i64, f32p, i64, i64,
                               i32p, f32p, ctypes.c_int32,
                               i32p, f32p, ctypes.c_int32]
    lib.resize_nearest_hwc.argtypes = [f32p, i64, i64, i64, f32p, i64,
                                       i64, i32p, i32p]
    _LIB = lib
    return _LIB


def set_enabled(flag: bool) -> None:
    """Test hook: force the numpy fallback with ``set_enabled(False)``."""
    global _FORCED_OFF
    _FORCED_OFF = not flag


def available() -> bool:
    return _load() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def color_jitter_inplace(arr: np.ndarray, order, factors) -> np.ndarray:
    """Apply up to 4 jitter ops in ``order`` to float32 [0,1] HWC ``arr``
    (mutated in place). ``factors[slot]`` NaN = skip."""
    lib = _load()
    assert lib is not None
    arr = np.ascontiguousarray(arr, np.float32)
    o = np.ascontiguousarray(order, np.int32)
    f = np.ascontiguousarray(factors, np.float32)
    lib.color_jitter(_fp(arr), arr.shape[0], arr.shape[1], _ip(o), _fp(f))
    return arr


def normalize(img: np.ndarray, mean, std) -> np.ndarray:
    """uint8 or float32-[0,1] HWC -> normalized float32 HWC."""
    lib = _load()
    assert lib is not None
    m = np.ascontiguousarray(mean, np.float32)
    s = np.ascontiguousarray(std, np.float32)
    out = np.empty(img.shape[:2] + (3,), np.float32)
    if img.dtype == np.uint8:
        src = np.ascontiguousarray(img)
        lib.normalize_u8(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _fp(out),
            img.shape[0], img.shape[1], _fp(m), _fp(s))
    else:
        src = np.ascontiguousarray(img, np.float32)
        lib.normalize_f32(_fp(src), _fp(out), img.shape[0], img.shape[1],
                          _fp(m), _fp(s))
    return out


@functools.lru_cache(maxsize=None)
def _banded_weights(in_size: int, out_size: int, mode: str):
    """(idx (out, taps) int32, w (out, taps) float32): the nonzeros of
    ops/resample.resize_weights' dense matrix, identical values."""
    if in_size == out_size:
        idx = np.arange(out_size, dtype=np.int32)[:, None]
        return idx, np.ones((out_size, 1), np.float32)
    from painter_tpu.ops.resample import _cubic_kernel
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    if mode == "linear":
        # torch clamps the source coordinate at 0 (resize_weights:51-57);
        # with src in [0, in-0.5) the floor needs no further clipping
        src = np.maximum(src, 0.0)
        i0 = np.floor(src).astype(np.int64)
        t = src - i0
        idx = np.stack([i0, np.clip(i0 + 1, 0, in_size - 1)], 1)
        w = np.stack([1.0 - t, t], 1)
        return idx.astype(np.int32), w.astype(np.float32)
    if mode == "cubic":
        i = np.floor(src).astype(np.int64)
        t = src - i
        idx = np.stack([np.clip(i + k, 0, in_size - 1)
                        for k in range(-1, 3)], 1)
        w = np.stack([_cubic_kernel(t - k) for k in range(-1, 3)], 1)
        return idx.astype(np.int32), w.astype(np.float32)
    raise ValueError(mode)


def resize_hwc(x: np.ndarray, out_hw, mode: str) -> np.ndarray:
    """Separable banded resize, torch semantics (== _np_resize2d)."""
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, np.float32)
    h, w, c = x.shape
    out = np.empty((out_hw[0], out_hw[1], c), np.float32)
    if mode == "nearest":
        from painter_tpu.ops.resample import nearest_indices
        ih = np.ascontiguousarray(nearest_indices(h, out_hw[0]), np.int32)
        iw = np.ascontiguousarray(nearest_indices(w, out_hw[1]), np.int32)
        lib.resize_nearest_hwc(_fp(x), h, w, c, _fp(out), out_hw[0],
                               out_hw[1], _ip(ih), _ip(iw))
        return out
    m = {"bicubic": "cubic", "bilinear": "linear"}[mode]
    ih, wh = _banded_weights(h, out_hw[0], m)
    iw, ww = _banded_weights(w, out_hw[1], m)
    lib.resize_hwc(_fp(x), h, w, c, _fp(out), out_hw[0], out_hw[1],
                   _ip(np.ascontiguousarray(ih)),
                   _fp(np.ascontiguousarray(wh)), ih.shape[1],
                   _ip(np.ascontiguousarray(iw)),
                   _fp(np.ascontiguousarray(ww)), iw.shape[1])
    return out
