"""Fused TPU attention with decomposed relative-position bias (Pallas).

Why a custom kernel (SURVEY.md §7 "hard parts"): the reference's attention
adds an MViTv2-style decomposed bias ``attn += rel_h[qh,qw,kh] +
rel_w[qh,qw,kw]`` to every logit (``Painter/util/vitdet_utils.py:96-125``),
which rules out off-the-shelf flash attention, and the XLA path
materializes the (B*heads, L, L) logits in HBM — the model's memory hot
spot (SURVEY.md §3.5).

Design for this model's regime (L = 1568..2450 tokens, head_dim 64):
- K and V for one (batch, head) fit comfortably in VMEM (~200 KB each in
  bf16), so instead of an online-softmax flash loop we keep whole K/V
  rows resident and tile only the query axis. Logits never touch HBM.
- The decomposed bias is supplied as the two *small* per-axis terms
  ``rel_h = q . Rh`` (L, Kh) and ``rel_w = q . Rw`` (L, Kw), computed by
  XLA einsums outside (they are ~60x smaller than the logits). Inside the
  kernel they are expanded to the full (block_q, L) bias with two one-hot
  matmuls on the otherwise-idle MXU — keeping every operand 128-lane
  aligned (no sub-lane reshapes/gathers).
- Softmax in fp32; q/k/v and the p@V matmul in bf16 with fp32 accumulate.
- The query grid uses ceil-division: tail rows compute garbage and are
  dropped on the out-of-bounds write, so any eval resolution works.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from painter_tpu.ops.pos_embed import get_rel_pos

DEFAULT_BLOCK_Q = 256


def _attn_kernel(q_ref, k_ref, v_ref, rel_h_ref, rel_w_ref, eh_ref, ew_ref,
                 o_ref):
    q = q_ref[0]            # (block_q, hd) bf16 (pre-scaled)
    k = k_ref[0]            # (L, hd)
    v = v_ref[0]            # (L, hd)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (block_q, L)
    # bias = rel_h @ one_hot(kh) + rel_w @ one_hot(kw), all MXU
    bias = jax.lax.dot_general(
        rel_h_ref[0], eh_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    bias += jax.lax.dot_general(
        rel_w_ref[0], ew_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s += bias
    s -= jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p * pl.reciprocal(denom, approx=False)).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _expanders_np(k_h: int, k_w: int):
    length = k_h * k_w
    cols = np.arange(length)
    eh = (cols // k_w == np.arange(k_h)[:, None])
    ew = (cols % k_w == np.arange(k_w)[:, None])
    return eh, ew


def _expanders(k_h: int, k_w: int, dtype_name: str):
    # numpy is cached; jnp conversion happens per-trace (never cache
    # tracers/device arrays across jit traces)
    eh, ew = _expanders_np(k_h, k_w)
    dt = jnp.dtype(dtype_name)
    return jnp.asarray(eh, dt), jnp.asarray(ew, dt)


def _attend(q, k, v, rel_h, rel_w, k_size: Tuple[int, int],
            block_q: int = DEFAULT_BLOCK_Q):
    """q,k,v: (BN, L, hd); rel_h: (BN, L, Kh); rel_w: (BN, L, Kw)."""
    bn, lq, hd = q.shape
    lk = k.shape[1]
    k_h, k_w = k_size
    assert k_h * k_w == lk, (k_size, lk)
    eh, ew = _expanders(k_h, k_w, str(q.dtype))
    grid = (bn, pl.cdiv(lq, block_q))

    return pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, k_h), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, k_w), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_h, lk), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_w, lk), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bn, lq, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bn * lq * lk * (2 * hd + k_h + k_w) // 1,
            bytes_accessed=(q.size + k.size + v.size + rel_h.size
                            + rel_w.size) * q.dtype.itemsize,
            transcendentals=bn * lq * lk,
        ),
    )(q, k, v, rel_h, rel_w, eh, ew)


def flash_attention_relpos(q, k, v, rel_pos_h, rel_pos_w,
                           q_size: Tuple[int, int], k_size: Tuple[int, int],
                           scale: float,
                           block_q: int = DEFAULT_BLOCK_Q,
                           interpret_fallback: bool = True):
    """Fused attention with decomposed rel-pos bias.

    q, k, v: (B, nh, L, hd). rel_pos_h/w: (Lh, hd)/(Lw, hd) tables.
    Returns (B, nh, L, hd). Numerics match the XLA path in
    :func:`painter_tpu.ops.attention.attention` (softmax fp32).
    """
    b, nh, lq, hd = q.shape
    lk = k.shape[2]
    q_h, q_w = q_size
    k_h, k_w = k_size

    rh = get_rel_pos(q_h, k_h, rel_pos_h).astype(q.dtype)  # (qh, kh, hd)
    rw = get_rel_pos(q_w, k_w, rel_pos_w).astype(q.dtype)  # (qw, kw, hd)
    rq = q.reshape(b, nh, q_h, q_w, hd)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", rq, rh).reshape(b * nh, lq, k_h)
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", rq, rw).reshape(b * nh, lq, k_w)

    qs = (q * jnp.asarray(scale, q.dtype)).reshape(b * nh, lq, hd)
    ks = k.reshape(b * nh, lk, hd)
    vs = v.reshape(b * nh, lk, hd)

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu or not interpret_fallback:
        out = _attend(qs, ks, vs, rel_h, rel_w, k_size, block_q)
    else:
        # CPU tests run the same kernel in the Pallas interpreter.
        out = _attend_interpret(qs, ks, vs, rel_h, rel_w, k_size, block_q)
    return out.reshape(b, nh, lq, hd)


def _attend_interpret(q, k, v, rel_h, rel_w, k_size, block_q):
    bn, lq, hd = q.shape
    lk = k.shape[1]
    k_h, k_w = k_size
    eh, ew = _expanders(k_h, k_w, str(q.dtype))
    grid = (bn, pl.cdiv(lq, block_q))
    return pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, lk, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, lk, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, k_h), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, k_w), lambda b, i: (b, i, 0)),
            pl.BlockSpec((k_h, lk), lambda b, i: (0, 0)),
            pl.BlockSpec((k_w, lk), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bn, lq, hd), q.dtype),
        interpret=True,
    )(q, k, v, rel_h, rel_w, eh, ew)
