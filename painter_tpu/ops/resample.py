"""Torch-semantics image/table resampling as separable matmuls.

The reference resizes positional tables and painted outputs with
``torch.nn.functional.interpolate`` (``Painter/util/vitdet_utils.py:75-93``
linear, ``:128-157`` bicubic; inference engines use
bilinear/nearest/bicubic on outputs). JAX's ``jax.image.resize`` uses a
Keys cubic kernel (a=-0.5) while torch uses a=-0.75, so a naive swap
drifts numerically. Instead we build the exact torch interpolation weight
matrix with numpy at trace time (all shapes are static under jit) and
apply the resize as one or two matmuls — exact to fp32 rounding and
MXU-friendly on TPU.

Only `antialias=False` torch semantics are implemented (all the reference
call sites use the default `antialias=False`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(s: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel; torch uses a=-0.75."""
    s = np.abs(s)
    out = np.zeros_like(s)
    m1 = s <= 1.0
    out[m1] = ((a + 2.0) * s[m1] - (a + 3.0)) * s[m1] * s[m1] + 1.0
    m2 = (s > 1.0) & (s < 2.0)
    out[m2] = ((a * s[m2] - 5.0 * a) * s[m2] + 8.0 * a) * s[m2] - 4.0 * a
    return out


@functools.lru_cache(maxsize=None)
def resize_weights(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """(out_size, in_size) matrix W s.t. ``y = W @ x`` == torch interpolate.

    mode: 'linear' (== bilinear along one axis) or 'cubic' (== bicubic
    along one axis), align_corners=False, antialias=False.
    """
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float64)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "linear":
        # torch clamps the source coordinate at 0 for linear modes.
        src = np.maximum(src, 0.0)
        i0 = np.floor(src).astype(np.int64)
        t = src - i0
        i0 = np.clip(i0, 0, in_size - 1)
        i1 = np.clip(i0 + 1, 0, in_size - 1)
        np.add.at(w, (dst.astype(np.int64), i0), 1.0 - t)
        np.add.at(w, (dst.astype(np.int64), i1), t)
    elif mode == "cubic":
        i = np.floor(src).astype(np.int64)
        t = src - i
        for k in range(-1, 3):
            wk = _cubic_kernel(t - k)
            idx = np.clip(i + k, 0, in_size - 1)
            np.add.at(w, (dst.astype(np.int64), idx), wk)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return w


@functools.lru_cache(maxsize=None)
def nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """torch 'nearest' (legacy) source index per output position."""
    dst = np.arange(out_size, dtype=np.float64)
    return np.minimum(np.floor(dst * (in_size / out_size)),
                      in_size - 1).astype(np.int32)


def resize1d(x: jnp.ndarray, out_size: int, mode: str,
             axis: int = 0) -> jnp.ndarray:
    """Resize one axis of `x` with torch `F.interpolate` semantics."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if mode == "nearest":
        idx = jnp.asarray(nearest_indices(in_size, out_size))
        return jnp.take(x, idx, axis=axis)
    w = jnp.asarray(resize_weights(in_size, out_size, mode), dtype=x.dtype)
    x_moved = jnp.moveaxis(x, axis, -1)
    # fp32 MXU precision: these resizes are tiny but parity-critical.
    y = jnp.matmul(x_moved, w.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, axis)


def resize2d(x: jnp.ndarray, out_hw, mode: str,
             h_axis: int = -3, w_axis: int = -2) -> jnp.ndarray:
    """Resize the (H, W) axes of an NHWC (or HWC) array.

    mode: 'bilinear' | 'bicubic' | 'nearest' (torch names).
    """
    mode1d = {"bilinear": "linear", "bicubic": "cubic",
              "nearest": "nearest"}[mode]
    x = resize1d(x, out_hw[0], mode1d, axis=h_axis % x.ndim)
    x = resize1d(x, out_hw[1], mode1d, axis=w_axis % x.ndim)
    return x
