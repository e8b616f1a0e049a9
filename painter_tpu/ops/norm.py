"""Normalization ops. LayerNorm statistics always run in fp32."""
from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over the last axis; fp32 statistics, output in x.dtype.

    Matches torch ``nn.LayerNorm`` (biased variance). Also serves as the
    reference's channel-wise ``LayerNorm2D`` (``vitdet_utils.py:189-209``):
    in our NHWC layout the channel axis *is* the last axis.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)
