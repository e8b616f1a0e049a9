"""Multi-head attention with decomposed relative-position bias (XLA path).

Behavioral contract from ``Painter/models_painter.py:33-89`` and
``Painter/util/vitdet_utils.py:96-125`` (MViTv2-style decomposed rel-pos):
``attn[b,n,(qh,qw),(kh,kw)] = q.k*scale + rel_h[qh,qw,kh] + rel_w[qh,qw,kw]``.

This is the XLA-fused path; the softmax runs in fp32. A Pallas
flash-attention kernel that regenerates the bias per tile lives in
:mod:`painter_tpu.kernels.flash_relpos` and is selected via
``attention(..., impl="pallas")`` once available.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from painter_tpu.ops import quant
from painter_tpu.ops.pos_embed import get_rel_pos


def rel_pos_bias(q: jnp.ndarray, rel_pos_h: jnp.ndarray,
                 rel_pos_w: jnp.ndarray, q_size: Tuple[int, int],
                 k_size: Tuple[int, int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decomposed rel-pos terms.

    q: (B, nh, qh*qw, head_dim). Returns (rel_h, rel_w) with shapes
    (B, nh, qh, qw, kh) and (B, nh, qh, qw, kw).
    """
    q_h, q_w = q_size
    k_h, k_w = k_size
    rh = get_rel_pos(q_h, k_h, rel_pos_h)  # (qh, kh, hd)
    rw = get_rel_pos(q_w, k_w, rel_pos_w)  # (qw, kw, hd)
    b, nh, _, hd = q.shape
    r_q = q.reshape(b, nh, q_h, q_w, hd)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, rh.astype(q.dtype))
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, rw.astype(q.dtype))
    return rel_h, rel_w


def attention(x: jnp.ndarray, params: dict, num_heads: int,
              hw: Tuple[int, int],
              rel_pos: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
              impl: str = "xla",
              kernel_mesh: Optional[tuple] = None) -> jnp.ndarray:
    """Full attention over an (B, H, W, C) token grid -> (B, H, W, C).

    params: {'qkv': {kernel (C, 3C), bias (3C)}, 'proj': {...}}.
    rel_pos: optional (rel_pos_h (Lh, hd), rel_pos_w (Lw, hd)) tables.
    kernel_mesh: optional (mesh, batch_axes) — on a multi-device mesh
    the Pallas kernel must run inside a shard_map over the batch
    shards (parallel.mesh.shard_batch0_kernel).
    """
    b, h, w, c = x.shape
    length = h * w
    head_dim = c // num_heads
    scale = head_dim ** -0.5

    qkv = quant.linear(params["qkv"], x.reshape(b, length, c))
    qkv = qkv.reshape(b, length, 3, num_heads, head_dim)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)  # (b, nh, L, hd)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)

    if impl == "pallas" and rel_pos is not None:
        from painter_tpu.kernels.flash_relpos import flash_attention_relpos
        from painter_tpu.parallel import mesh as mesh_lib

        def _kernel(q_, k_, v_, rh_, rw_):
            return flash_attention_relpos(q_, k_, v_, rh_, rw_,
                                          (h, w), (h, w), scale)

        out = mesh_lib.shard_batch0_kernel(
            _kernel, n_batch_args=3, n_rep_args=2,
            kernel_mesh=kernel_mesh)(q, k, v, rel_pos[0], rel_pos[1])
    else:
        attn = jnp.einsum("bnqd,bnkd->bnqk", q * scale, k)
        if rel_pos is not None:
            rel_h, rel_w = rel_pos_bias(q, rel_pos[0], rel_pos[1],
                                        (h, w), (h, w))
            attn = attn.reshape(b, num_heads, h, w, h, w)
            attn = attn + rel_h[..., None] + rel_w[..., None, :]
            attn = attn.reshape(b, num_heads, length, length)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn.astype(x.dtype), v)

    out = out.transpose(0, 2, 1, 3).reshape(b, length, c)
    out = quant.linear(params["proj"], out)
    return out.reshape(b, h, w, c)
