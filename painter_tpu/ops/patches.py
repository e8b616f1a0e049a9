"""Patchify/unpatchify for stitched-pair images (NHWC, TPU-native layout).

Behavior mirrors ``Painter/models_painter.py:355-383``: images are the
vertical stitch of an in-context pair so H == 2*W, and the per-patch pixel
vector ordering is (patch_row, patch_col, channel) with channel fastest.
"""
from __future__ import annotations

import jax.numpy as jnp


def patchify(imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(N, H, W, 3) -> (N, L, p*p*3), requires H == 2*W."""
    n, height, width, c = imgs.shape
    p = patch_size
    assert height == 2 * width and height % p == 0, (height, width, p)
    h, w = height // p, width // p
    x = imgs.reshape(n, h, p, w, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * w, p * p * c)


def unpatchify(x: jnp.ndarray, patch_size: int,
               channels: int = 3) -> jnp.ndarray:
    """(N, L, p*p*C) -> (N, H, W, C), assuming the H == 2*W token grid."""
    n, length, _ = x.shape
    p = patch_size
    w = int(round((length * 0.5) ** 0.5))
    h = w * 2
    assert h * w == length, (h, w, length)
    x = x.reshape(n, h, w, p, p, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * p, w * p, channels)
