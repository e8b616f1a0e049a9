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
