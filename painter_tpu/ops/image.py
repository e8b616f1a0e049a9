"""On-device image preprocessing for the in-context protocol.

The reference does stitch/normalize/resize in numpy/PIL on CPU per image
(``seggpt_engine.py:56-103``, ``eval/*/painter_inference_*.py``); here the
math lives in jittable ops so engines can fuse it into the forward pass
(BASELINE.json north star). File IO stays host-side in the engines.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from painter_tpu.configs import IMAGENET_MEAN, IMAGENET_STD


def normalize(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB -> ImageNet-normalized, last axis = channels."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def denormalize(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return x * std + mean


# all 256 correctly-rounded fp32 values of u/255, computed host-side in
# f64 — an in-graph ``x/255`` is NOT bit-exact (XLA rewrites division by
# a constant into multiplication by its reciprocal: 1 ulp off on 126 of
# the 256 lattice points, measured on XLA:CPU), so from_uint8 gathers
# from this table instead
_U8_TO_UNIT = np.ascontiguousarray(
    (np.arange(256, dtype=np.float64) / 255.0).astype(np.float32))


def from_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB -> [0,1] fp32, bit-exact vs the host ``np.array(img)/255.``

    A 256-entry exact-value gather (see ``_U8_TO_UNIT``): shipping raw
    uint8 across the host->device link and converting in-graph then
    changes nothing downstream — verified exhaustively against the host
    divide in tests/test_infer_engine.py — while cutting link bytes 4x.
    The 1 KB table lives comfortably in VMEM; the gather is noise next
    to the model call it feeds.
    """
    return jnp.asarray(_U8_TO_UNIT)[x.astype(jnp.int32)]


def to_uint8_255(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1]-scale painted output -> the eval write path's 0-255 uint8.

    Mirrors the host chain ``np.clip(out_fp32 * 255, 0, 255)`` followed
    by ``.astype(np.uint8)`` (scale_and_resize + run_eval's PNG write;
    reference anchor: clip at ``seggpt_engine.py:52``, truncating uint8
    cast at ``painter_inference_segm.py:88-93``): same fp32 multiply and
    clip; ``floor`` == numpy's truncating cast for non-negative floats.
    End-to-end protocol-exact wherever the host resize is `nearest` or
    identity (nearest-gather commutes with per-pixel quantization);
    bilinear/bicubic tasks must keep the fp32 fetch.
    """
    x = jnp.clip(x.astype(jnp.float32) * jnp.float32(255.0), 0.0, 255.0)
    return jnp.floor(x).astype(jnp.uint8)


def stitch_pairs(prompts: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Stack prompt over query along height: (N,H,W,3)x2 -> (N,2H,W,3).

    Prompt on top is the in-context convention (``seggpt_engine.py:75-76``,
    ``pairdataset.py:100-104`` stitches sample-under-prompt the same way).
    """
    return jnp.concatenate([prompts, queries], axis=1)


def bottom_half_mask(batch: int, num_patches: int) -> jnp.ndarray:
    """(B, L) mask: zeros top half, ones bottom (seggpt_engine.py:36-38)."""
    m = np.zeros((batch, num_patches), np.float32)
    m[:, num_patches // 2:] = 1.0
    return jnp.asarray(m)
