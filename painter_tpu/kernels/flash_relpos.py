"""Fused TPU attention with decomposed relative-position bias (Pallas).

Why a custom kernel (SURVEY.md §7 "hard parts"): the reference's attention
adds an MViTv2-style decomposed bias ``attn += rel_h[qh,qw,kh] +
rel_w[qh,qw,kw]`` to every logit (``Painter/util/vitdet_utils.py:96-125``),
which rules out off-the-shelf flash attention, and the XLA path
materializes the (B*heads, L, L) logits in HBM — the model's memory hot
spot (SURVEY.md §3.5; the XLA path OOMs at batch 16 on a 16G v5e).

Design for this model's regime (L = 1568..2450 tokens, head_dim 64):
- K and V for one (batch, head) fit comfortably in VMEM (~200 KB each in
  bf16), so instead of an online-softmax flash loop we keep whole K/V
  rows resident and tile only the query axis. Logits never touch HBM.
- The decomposed bias enters as the two *small* per-axis terms
  ``rel_h = q . Rh`` (L, Kh) and ``rel_w = q . Rw`` (L, Kw), computed by
  XLA einsums outside (~60x smaller than the logits). In-kernel they are
  expanded to the (block_q, L) bias with two one-hot matmuls on the
  otherwise-idle MXU — keeping every operand 128-lane aligned.
- Softmax in fp32; q/k/v and the p@V matmul in bf16 with fp32 accumulate.
- The query grid uses ceil-division with row masking, so any eval
  resolution works.
- Full custom VJP: the backward kernel recomputes the row softmax in
  VMEM (flash-style, no saved logits) and accumulates dK/dV across query
  tiles in a revisited fp32 output block; bias-term gradients flow back
  through the XLA rel-term einsums (and the rel-table resolution
  interpolation) via ``jax.vjp``.
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

DEFAULT_BLOCK_Q = 392


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


def _dot(a, b, trans_a=False, trans_b=False):
    dims = (((0 if trans_a else 1,), (1 if trans_b else 0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _exp_rows(q, k, rel_h, rel_w, eh, ew):
    """(block_q, L) max-subtracted exp logits + row sums (fp32)."""
    s = _dot(q, k, trans_b=True)
    s += _dot(rel_h, eh)
    s += _dot(rel_w, ew)
    s -= jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e, jnp.sum(e, axis=-1, keepdims=True)


def _softmax_rows(q, k, rel_h, rel_w, eh, ew):
    """(block_q, L) row-softmax with in-kernel bias expansion (fp32)."""
    e, denom = _exp_rows(q, k, rel_h, rel_w, eh, ew)
    return e * pl.reciprocal(denom, approx=False)


def _row_mask(i, block_q, lq):
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0) \
        + i * block_q
    return rows < lq


def _attn_fwd_kernel(q_ref, k_ref, v_ref, rel_h_ref, rel_w_ref, eh_ref,
                     ew_ref, o_ref):
    # normalize after the PV matmul: one (block_q, hd) scale instead of a
    # (block_q, L) probability materialization pass
    e, denom = _exp_rows(q_ref[0], k_ref[0], rel_h_ref[0], rel_w_ref[0],
                         eh_ref[:], ew_ref[:])
    o = _dot(e.astype(v_ref.dtype), v_ref[0])
    o_ref[0] = (o * pl.reciprocal(denom, approx=False)).astype(o_ref.dtype)


def _attn_bwd_kernel(lq_ref, q_ref, k_ref, v_ref, rel_h_ref, rel_w_ref,
                     eh_ref, ew_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, drh_ref, drw_ref):
    i = pl.program_id(1)
    block_q = q_ref.shape[1]
    # zero the ceil-div padding rows up front: OOB block reads are
    # undefined and even one NaN would survive 0*NaN in the dK/dV sums
    mask = _row_mask(i, block_q, lq_ref[0])
    q = jnp.where(mask, q_ref[0], 0.0).astype(q_ref.dtype)
    do = jnp.where(mask, do_ref[0], 0.0).astype(do_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    p = _softmax_rows(q, k, rel_h_ref[0], rel_w_ref[0], eh_ref[:],
                      ew_ref[:])
    p = jnp.where(mask, p, 0.0)
    dp = _dot(do, v, trans_b=True)                      # (bq, L) fp32
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta)                               # (bq, L) fp32
    ds_b = ds.astype(q.dtype)
    p_b = p.astype(q.dtype)

    dq_ref[0] = _dot(ds_b, k).astype(dq_ref.dtype)
    drh_ref[0] = _dot(ds_b, eh_ref[:], trans_b=True).astype(drh_ref.dtype)
    drw_ref[0] = _dot(ds_b, ew_ref[:], trans_b=True).astype(drw_ref.dtype)

    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += _dot(ds_b, q, trans_a=True)            # (L, hd) fp32
    dv_ref[0] += _dot(p_b, do, trans_a=True)


def _fwd_impl(qs, ks, vs, rel_h, rel_w, k_size, block_q, interpret):
    bn, lq, hd = qs.shape
    lk = ks.shape[1]
    k_h, k_w = k_size
    eh, ew = _expanders(k_h, k_w, str(qs.dtype))
    grid = (bn, pl.cdiv(lq, block_q))
    kw = {} if not interpret else {"interpret": True}
    return pl.pallas_call(
        _attn_fwd_kernel,
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
        out_shape=jax.ShapeDtypeStruct((bn, lq, hd), qs.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bn * lq * lk * (2 * hd + k_h + k_w),
            bytes_accessed=(qs.size + ks.size + vs.size + rel_h.size
                            + rel_w.size) * qs.dtype.itemsize,
            transcendentals=bn * lq * lk,
        ),
        **kw,
    )(qs, ks, vs, rel_h, rel_w, eh, ew)


def _bwd_impl(qs, ks, vs, rel_h, rel_w, g, k_size, block_q, interpret):
    bn, lq, hd = qs.shape
    lk = ks.shape[1]
    k_h, k_w = k_size
    eh, ew = _expanders(k_h, k_w, str(qs.dtype))
    grid = (bn, pl.cdiv(lq, block_q))
    lq_arr = jnp.full((1,), lq, jnp.int32)
    kw = {} if not interpret else {"interpret": True}
    out_shapes = (
        jax.ShapeDtypeStruct((bn, lq, hd), jnp.float32),    # dq (scaled)
        jax.ShapeDtypeStruct((bn, lk, hd), jnp.float32),    # dk
        jax.ShapeDtypeStruct((bn, lk, hd), jnp.float32),    # dv
        jax.ShapeDtypeStruct((bn, lq, k_h), jnp.float32),   # drel_h
        jax.ShapeDtypeStruct((bn, lq, k_w), jnp.float32),   # drel_w
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, lk, hd), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, lk, hd), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, block_q, k_h), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, k_w), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((k_h, lk), lambda b, i, *_: (0, 0)),
            pl.BlockSpec((k_w, lk), lambda b, i, *_: (0, 0)),
            pl.BlockSpec((1, block_q, hd), lambda b, i, *_: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, hd), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, lk, hd), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, lk, hd), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, block_q, k_h), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, k_w), lambda b, i, *_: (b, i, 0)),
        ),
    )
    return pl.pallas_call(
        _attn_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        **kw,
    )(lq_arr, qs, ks, vs, rel_h, rel_w, eh, ew, g)


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _rel_terms(q, rph, rpw, q_size, k_size):
    """Unscaled q -> (rel_h, rel_w) bias terms, differentiable XLA path.

    Includes the table resolution interpolation (vitdet_utils.py:63-93).
    """
    b, nh, lq, hd = q.shape
    q_h, q_w = q_size
    k_h, k_w = k_size
    rh = get_rel_pos(q_h, k_h, rph).astype(q.dtype)
    rw = get_rel_pos(q_w, k_w, rpw).astype(q.dtype)
    rq = q.reshape(b, nh, q_h, q_w, hd)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", rq, rh).reshape(
        b * nh, lq, k_h)
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", rq, rw).reshape(
        b * nh, lq, k_w)
    return rel_h, rel_w


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_core(q, k, v, rph, rpw, q_size, k_size, scale, block_q):
    out, _ = _flash_fwd(q, k, v, rph, rpw, q_size, k_size, scale, block_q)
    return out


def _flash_fwd(q, k, v, rph, rpw, q_size, k_size, scale, block_q):
    b, nh, lq, hd = q.shape
    lk = k.shape[2]
    rel_h, rel_w = _rel_terms(q, rph, rpw, q_size, k_size)
    qs = (q * jnp.asarray(scale, q.dtype)).reshape(b * nh, lq, hd)
    out = _fwd_impl(qs, k.reshape(b * nh, lk, hd),
                    v.reshape(b * nh, lk, hd), rel_h, rel_w, k_size,
                    block_q, _use_interpret())
    return out.reshape(b, nh, lq, hd), (q, k, v, rph, rpw)


def _flash_bwd(q_size, k_size, scale, block_q, res, g):
    q, k, v, rph, rpw = res
    b, nh, lq, hd = q.shape
    lk = k.shape[2]
    rel_fn = lambda q_, rph_, rpw_: _rel_terms(q_, rph_, rpw_, q_size,
                                               k_size)
    (rel_h, rel_w), rel_vjp = jax.vjp(rel_fn, q, rph, rpw)
    qs = (q * jnp.asarray(scale, q.dtype)).reshape(b * nh, lq, hd)
    dqs, dk, dv, drh, drw = _bwd_impl(
        qs, k.reshape(b * nh, lk, hd), v.reshape(b * nh, lk, hd),
        rel_h, rel_w, g.reshape(b * nh, lq, hd).astype(q.dtype),
        k_size, block_q, _use_interpret())
    dq_rel, drph, drpw = rel_vjp((drh.astype(rel_h.dtype),
                                  drw.astype(rel_w.dtype)))
    dq = dqs.reshape(b, nh, lq, hd).astype(q.dtype) \
        * jnp.asarray(scale, q.dtype) + dq_rel
    return (dq, dk.reshape(b, nh, lk, hd).astype(k.dtype),
            dv.reshape(b, nh, lk, hd).astype(v.dtype),
            drph.astype(rph.dtype), drpw.astype(rpw.dtype))


_flash_core.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_relpos(q, k, v, rel_pos_h, rel_pos_w,
                           q_size: Tuple[int, int], k_size: Tuple[int, int],
                           scale: float,
                           block_q: int = DEFAULT_BLOCK_Q,
                           interpret_fallback: bool = True):
    """Fused attention with decomposed rel-pos bias (differentiable).

    q, k, v: (B, nh, L, hd). rel_pos_h/w: (Lh, hd)/(Lw, hd) tables.
    Returns (B, nh, L, hd). Numerics match the XLA path in
    :func:`painter_tpu.ops.attention.attention` (softmax fp32). On CPU
    the same kernels run in the Pallas interpreter.
    """
    del interpret_fallback  # auto-detected per backend
    return _flash_core(q, k, v, rel_pos_h, rel_pos_w, tuple(q_size),
                       tuple(k_size), float(scale), int(block_q))
