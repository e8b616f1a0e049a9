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
- head_dim 64 fills only half of the MXU's 128-lane contraction, so one
  of the two per-axis bias terms is **folded into the QK contraction**:
  ``qf = [q*scale, rel_axis_term]`` against ``kf = [k, onehot_axis]``
  makes the main matmul a single 120-of-128-lane pass (94% lane
  utilization) that computes logits *and* that bias in one go. The axis
  with the larger table that still fits 128 lanes is folded (rel_h for
  the 56x28 train grid, rel_w for the 70x35 COCO eval grid); the other
  axis is expanded by a one-hot matmul on the same tiles (or a VPU
  lane-tile with ``rw_tile=True``).
- The kernel is VPU-bound, not MXU-bound, so every (block_q, L) vector
  pass matters. Three flash-style restructurings remove most of them:
  (a) V carries an appended ones-column, so the PV matmul produces the
  softmax denominator in its padded 65->128 output lanes — the fp32
  row-sum pass is free MXU work; (b) the forward saves the row
  logsumexp, so the backward recomputes probabilities with a single
  ``exp2`` pass (no max, no sum); (c) ``delta = rowsum(do*o)`` is
  computed outside the kernel on (L, head_dim) arrays instead of the
  (block_q, L) ``dp*p`` reduction.
- Softmax in fp32 with ``exp2``: all logit terms are pre-scaled by
  log2(e), so the VPU evaluates ``exp2`` directly (exp is
  exp2(x*log2e) in hardware; pre-scaling removes the extra multiply).
- **No running max**: because probabilities are ratios, any fixed shift
  leaves the softmax exact, and fp32's exponent range (2^±126) dwarfs
  trained-ViT logit magnitudes (O(30) in the exp2 domain). The forward
  therefore skips the max pass and its subtract — two of the ~six VPU
  passes per logit on a VPU-bound kernel — evaluating
  ``exp2(min(s, 114))`` directly; the clamp (margin: 126 - log2(L_max))
  makes overflow impossible and only engages for logits > 79 nats,
  where fp32 ``exp`` itself is about to overflow anyway. On the
  underflow side, a row whose logits ALL sit below -87 nats would sum
  to zero; a denominator floor degrades such rows to zero output
  instead of inf/NaN. Both tails are far outside trained-ViT ranges;
  ``max_mode="exact"`` restores the classic guarded softmax for
  out-of-distribution logit ranges. The saved ``lse = log2(rowsum)``
  keeps the backward's single-``exp2``-pass recompute exact.
- Each query block is processed as two interleaved sub-tiles so the
  scheduler can overlap one sub-tile's softmax (VPU) with the other's
  QK / PV matmuls (MXU).
- The query grid uses ceil-division with row masking, so any eval
  resolution works.
- Full custom VJP; bias-term gradients flow back through the XLA
  rel-term einsums (and the rel-table resolution interpolation) via
  ``jax.vjp``. The folded layout pays off again in the backward:
  ``ds @ kf`` yields dq and the folded-axis bias gradient in one
  94%-lane matmul.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from painter_tpu.ops.pos_embed import get_rel_pos

LOG2E = math.log2(math.e)
MXU_LANES = 128
# fixed-max softmax overflow guard: exp2 arguments are clamped here so the
# (L <= 4096)-term denominator sum stays below fp32 inf (126 - log2(4096))
EXP2_CLAMP = 114.0


def _exp2(x, impl: str):
    """``exp2`` with a selectable lowering (softmax VPU-floor attempt #4).

    ``"native"``: the stock ``jnp.exp2`` lowering. ``"poly3"``: integer
    exponent assembly — split ``x`` into ``i = round(x)`` and
    ``f = x - i`` in [-0.5, 0.5]; approximate ``2**f`` with a degree-3
    polynomial (minimax on relative error via Lawson-iterated LSQ; max
    rel err 7.5e-5, ~50x under the bf16 cast noise of 3.9e-3 the kernel
    already accepts on the forward's very next instruction) and
    build ``2**i`` exactly by bitcasting ``(i + 127) << 23`` into the
    fp32 exponent field. Measured on the v5e (2026-08-17 microbench of
    a (784, 1568) softmax-stage tile including the PV matmul): native
    36.2 us/tile, poly3 31.6 us/tile == the no-exp2 floor — the VPU
    runs the 3-FMA chain at full vector rate while the native
    transcendental lowering costs ~13% of the stage. Inputs below -126
    flush to zero (native exp2 produces denormals down to 2^-149;
    probabilities that small are far below bf16 resolution either way,
    and the kernel re-masks / floors the denominator after exp2).

    MEASURED-AND-REJECTED as the default (kept opt-in): in the full
    kernel the isolated win inverts — on-chip e2e A/B at ViT-L 896x448
    (2026-08-17, /tmp/r3b/ab_exp2.log): fwd b8 51.21 -> 43.76 pairs/s
    (-15%), b16 49.13 -> 42.33, train step 734 -> 804 ms. The extra
    round/bitcast/select ops lengthen the softmax stage's dependency
    chain and break Mosaic's VLIW overlap of exp2 with the surrounding
    MXU work (trap #3: isolated-stage wins can lose e2e). Numerics were
    fine (2.5e-2 max abs vs XLA at 448, within the kernel's bf16
    envelope); performance was not.
    """
    if impl == "native":
        return jnp.exp2(x)
    i = jnp.round(x)
    f = x - i
    p = ((0.055170528 * f + 0.242608298) * f + 0.693260919) * f \
        + 0.999928253
    ii = jnp.clip(i, -126.0, 127.0).astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type((ii + 127) << 23, jnp.float32)
    return jnp.where(x < -126.0, 0.0, scale * p)


def _subtiles(block_q: int, num_sub: int):
    """Split block_q into ``num_sub`` sublane-aligned (offset, size) tiles."""
    if num_sub <= 1 or block_q <= 8:
        return [(0, block_q)]
    base = block_q // num_sub
    sizes = [base + (block_q - base * num_sub) if i == 0 else base
             for i in range(num_sub)]
    sizes = [((s + 7) // 8) * 8 for s in sizes]
    sizes[-1] = block_q - sum(sizes[:-1])
    if sizes[-1] <= 0:
        return [(0, block_q)]
    offs, cur = [], 0
    for s in sizes:
        offs.append((cur, s))
        cur += s
    return offs


@functools.lru_cache(maxsize=None)
def _expanders_np(k_h: int, k_w: int):
    """One-hot expanders: eh (k_h, L) selects rows by kh = col // k_w,
    ew (k_w, L) by kw = col % k_w."""
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


def _fold_axis(hd: int, k_size: Tuple[int, int]) -> str:
    """Which bias axis to fold into the QK contraction: the larger table
    that keeps the contraction within one 128-lane MXU tile."""
    k_h, k_w = k_size
    if hd + max(k_h, k_w) <= MXU_LANES:
        return "h" if k_h >= k_w else "w"
    if hd + min(k_h, k_w) <= MXU_LANES:
        return "h" if k_h < k_w else "w"
    raise ValueError(
        f"head_dim {hd} + min rel table {min(k_h, k_w)} exceeds the "
        f"{MXU_LANES}-lane MXU tile; use the XLA attention path")


def _dot(a, b, trans_a=False, trans_b=False, prefer=jnp.float32):
    dims = (((0 if trans_a else 1,), (1 if trans_b else 0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=prefer)


def _logits(qf, kf, rx, ex, reps, rw_tile, emit_dtype=jnp.float32):
    """(sub_q, L) fp32 logits, pre-scaled by log2e (exp2 domain).

    ``emit_dtype=bfloat16`` makes the QK matmul *emit* its tile in bf16
    (fp32 MXU accumulation either way) and upcasts right after — the
    numeric effect is one bf16 rounding of the logit tile; see
    ``BWD_TILE_BF16``.
    """
    s = _dot(qf, kf, trans_b=True, prefer=emit_dtype)
    if emit_dtype != jnp.float32:
        s = s.astype(jnp.float32)
    if rw_tile:
        # VPU lane-tile of the k_w-period bias (only valid when the
        # expanded axis is 'w': col bias = rx[:, col % k_w])
        s += jnp.tile(rx, (1, reps)).astype(jnp.float32)
    else:
        s += _dot(rx, ex)
    return s


def _row_mask(i, block_q, sz, lq, off=0):
    """Valid-row mask for the (off, sz) sub-tile of query block i."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (sz, 1), 0) \
        + i * block_q + off
    return rows < lq


def _make_fwd_kernel(hd: int, reps: int, rw_tile: bool, num_sub: int,
                     max_mode: str, exp2_impl: str):
    def _attn_fwd_kernel(qf_ref, kf_ref, vf_ref, rx_ref, ex_ref, o_ref,
                         lse_ref):
        kf = kf_ref[0]
        vf = vf_ref[0]
        block_q = qf_ref.shape[1]
        tiles = _subtiles(block_q, num_sub)
        # two independent chains: sub-tile j's softmax (VPU) overlaps
        # sub-tile j+1's QK matmul (MXU)
        ss = [_logits(qf_ref[0, pl.ds(off, sz)], kf,
                      rx_ref[0, pl.ds(off, sz)], ex_ref[:], reps, rw_tile)
              for off, sz in tiles]
        for (off, sz), s in zip(tiles, ss):
            if max_mode == "fixed":
                # fixed-max softmax: skip the per-row max pass (see
                # module docstring); the clamp only guards overflow
                e = _exp2(jnp.minimum(s, EXP2_CLAMP),
                          exp2_impl).astype(vf.dtype)
                m = None
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                e = _exp2(s - m, exp2_impl).astype(vf.dtype)
            # vf's appended ones-column makes ov[:, hd] the row sum of e:
            # the softmax denominator is free MXU work in the padded
            # output lanes
            ov = _dot(e, vf)
            denom = ov[:, hd:hd + 1]
            if max_mode == "fixed":
                # all-underflow guard: if every logit in a row sits
                # below the fp32 exp2 floor (< -87 nats — outside the
                # documented validity envelope), the unshifted sum is 0;
                # degrade to a zero output row instead of inf/NaN
                denom = jnp.maximum(denom, 1e-37)
            o_ref[0, pl.ds(off, sz)] = (
                ov[:, :hd] * pl.reciprocal(denom, approx=False)).astype(
                o_ref.dtype)
            lse = jnp.log2(denom)
            lse_ref[0, pl.ds(off, sz)] = lse if m is None else m + lse
    return _attn_fwd_kernel


# dk/dv accumulator layout: True fuses both into one (lk, 2*hd=128)
# buffer so the per-query-block accumulator add runs at full 128-lane
# vreg utilization instead of two half-lane (lk, 64) passes.
# MEASURED-AND-TIED (2026-08-19, B=8 ViT-L save_kernel train step):
# 653.2 vs 653.3 ms/step — the accumulator adds are not on the critical
# path (the bwd is matmul/softmax-bound). Kept selectable; default
# stays the simpler unfused layout. Numerics identical (interpret-mode
# gradient parity in tests).
DKV_FUSED = False

# Backward tile-precision knob (round-5 A/B of the one unmeasured
# structural family): the backward's documented floor is its QK-family
# matmuls emitting (block_q, L) fp32 tiles at ~26-31 TFLOPS as-executed
# (BASELINE.md stage-marginal profile) — at the flagship's full-L bwd
# tile each such tile is 1568x1568 fp32 = 9.8 MB of result vregs/VMEM.
# Members of this set make the corresponding matmul EMIT its tile in
# bf16 (the MXU still accumulates fp32; the tile is upcast to fp32
# immediately after, so the numeric effect is exactly one bf16 rounding
# of that tile — softmax statistics, ds, and the dk/dv accumulators all
# stay fp32):
#   "s"  — the recomputed logit tile (feeds exp2; rounding delta on a
#          logit of magnitude m perturbs p by a factor 2**(m * 2^-9))
#   "dp" — the dO @ V^T tile (values O(1); ~0.2% relative rounding)
#
# MEASURED-AND-REJECTED as UNEXPRESSIBLE on this toolchain (2026-08-19):
# Mosaic refuses bf16 matmul emission outright — lowering the flagship
# train step with {"dp"} raises `'tpu.matmul' op Expected matmul acc to
# be 32-bit` (docs/measurements/ROUND5.md). The matmul OPERANDS were
# already bf16 (ds_b/p_b casts below), so there is no operand-precision
# headroom left either; the fp32 logit-tile pacing floor cannot be
# attacked via tile width on current Mosaic. The knob + interpret-mode
# envelope tests (tests/test_flash_relpos.py) are kept so the numeric
# contract is pinned if a future Mosaic lifts the accumulator
# restriction.
BWD_TILE_BF16 = frozenset()

# Backward-only exp2 lowering override (None = inherit the call's
# exp2_impl). Motivation (round-4 stage marginals, BASELINE.md): in the
# FORWARD exp2 is measured free (fully VLIW-overlapped with the QK/PV
# matmuls — why the poly3 default was rejected at -15% e2e), but the
# BACKWARD's no_exp2 variant saves ~1.3 ms of a 6.4 ms kernel: the bwd
# recompute's exp2 sits on the critical path between the s matmul and
# the dv/ds consumers, so a faster lowering can pay there even though
# it lost in the forward. Set to "poly3" to A/B (max rel err 7.5e-5 on
# p — far inside the kernel's bf16 gradient envelope).
BWD_EXP2_IMPL = None

# Fold the dq and d(rel-expanded) matmuls into ONE MXU pass: both
# contract ds_b (block_q, L) against an (L, ·) operand — kf (128 lanes)
# and ex^T (k_x lanes). Lane-concat of the operands inside the kernel
# turns two LHS streams of the 4.9 MB ds_b tile into one, and the drx
# product's 28-of-128-lane MXU waste rides the dq matmul's output tile
# instead of paying its own pass.
BWD_FOLD_DQ_DRX = False


def _make_bwd_kernel(hd: int, reps: int, rw_tile: bool, num_sub: int,
                     ragged: bool, clamp: bool, exp2_impl: str,
                     dkv_fused: bool, tile_bf16: frozenset = frozenset(),
                     fold_dqdrx: bool = False):
    def _attn_bwd_kernel(lq_ref, qf_ref, kf_ref, v_ref, rx_ref, ex_ref,
                         do_ref, lse_ref, delta_ref,
                         dqf_ref, dk_ref, *rest):
        if dkv_fused:  # dk_ref is the fused (lk, 2*hd) [dk | dv] buffer
            (drx_ref,) = rest
            dv_ref = None
        else:
            dv_ref, drx_ref = rest
        i = pl.program_id(1)
        block_q = qf_ref.shape[1]
        if fold_dqdrx:
            # kf_ref carries the folded [kf | ex^T] (lk, hdf+k_x)
            # operand (see BWD_FOLD_DQ_DRX); the s matmul contracts
            # only the real kf lanes
            kex = kf_ref[0]
            kf = kex[:, :qf_ref.shape[2]]
        else:
            kf = kf_ref[0]
        v = v_ref[0]

        @pl.when(i == 0)
        def _():
            dk_ref[0] = jnp.zeros_like(dk_ref[0])
            if not dkv_fused:
                dv_ref[0] = jnp.zeros_like(dv_ref[0])

        for off, sz in _subtiles(block_q, num_sub):
            # zero the ceil-div padding rows up front: OOB block reads
            # are undefined and even one NaN would survive 0*NaN in the
            # dK/dV sums. When block_q divides L exactly (the flagship
            # shapes) there are no padding rows and the masking passes
            # — including a full (sq, L) select on p — are skipped
            # statically.
            mask = _row_mask(i, block_q, sz, lq_ref[0], off) if ragged \
                else None
            mz = (lambda x: jnp.where(mask, x, 0.0)) if ragged \
                else (lambda x: x)
            qf = mz(qf_ref[0, pl.ds(off, sz)]).astype(qf_ref.dtype)
            do = mz(do_ref[0, pl.ds(off, sz)]).astype(do_ref.dtype)
            s = _logits(qf, kf, rx_ref[0, pl.ds(off, sz)], ex_ref[:],
                        reps, rw_tile,
                        emit_dtype=jnp.bfloat16 if "s" in tile_bf16
                        else jnp.float32)
            # saved logsumexp -> one exp2 pass, no max/sum recompute;
            # the lse of a padding row could be garbage (even NaN), so
            # re-mask after exp2. Under the fixed-max softmax mirror the
            # forward's EXP2_CLAMP so out-of-envelope logits reproduce
            # the forward's (finite, degraded) probabilities instead of
            # overflowing to inf gradients.
            if clamp:
                s = jnp.minimum(s, EXP2_CLAMP)
            p = mz(_exp2(s - lse_ref[0, pl.ds(off, sz)], exp2_impl))
            # (sq, L); fp32 by default, bf16-emitted under the knob
            dp = _dot(do, v, trans_b=True,
                      prefer=jnp.bfloat16 if "dp" in tile_bf16
                      else jnp.float32)
            # delta = rowsum(do*o) precomputed outside on (L, hd) arrays;
            # padding rows' OOB delta must be zeroed (0*NaN survives)
            delta = mz(delta_ref[0, pl.ds(off, sz)])
            ds = p * (dp - delta)                           # (sq, L) fp32
            ds_b = ds.astype(qf.dtype)
            p_b = p.astype(qf.dtype)

            # one folded matmul: [:, :hd] = ds @ k = dq/scale,
            # [:, hd:] = ds @ onehot^T = d(folded bias term)
            if fold_dqdrx:
                # single MXU pass over ds_b: lanes [:hdf] = dq-family,
                # [hdf:] = d(expanded bias) — same products, one LHS
                # stream (BWD_FOLD_DQ_DRX)
                hdf = qf_ref.shape[2]
                r = _dot(ds_b, kex)
                dqf_ref[0, pl.ds(off, sz)] = r[:, :hdf].astype(
                    dqf_ref.dtype)
                drx_ref[0, pl.ds(off, sz)] = r[:, hdf:].astype(
                    drx_ref.dtype)
            else:
                dqf_ref[0, pl.ds(off, sz)] = _dot(ds_b, kf).astype(
                    dqf_ref.dtype)
                drx_ref[0, pl.ds(off, sz)] = _dot(
                    ds_b, ex_ref[:], trans_b=True).astype(drx_ref.dtype)
            # dk = ds^T @ (q*scale*log2e); log2e is divided out in XLA
            if dkv_fused:
                # lane-concat the two (lk, hd) dots into one 128-lane
                # accumulator add (dk_ref doubles as [dk | dv])
                dk_ref[0] += jnp.concatenate(
                    [_dot(ds_b, qf[:, :hd], trans_a=True),
                     _dot(p_b, do, trans_a=True)], axis=1)
            else:
                dk_ref[0] += _dot(ds_b, qf[:, :hd], trans_a=True)
                dv_ref[0] += _dot(p_b, do, trans_a=True)
    return _attn_bwd_kernel


def _fwd_impl(qf, kf, vf, rx, ex, hd, reps, rw_tile, block_q, num_sub,
              max_mode, exp2_impl, interpret, kernel_maker=None):
    # kernel_maker: optional drop-in replacement for _make_fwd_kernel
    # (same signature) — used by utils/kernel_stage_profile to time
    # stage-dropped variants without monkeypatching module globals
    bn, lq, hdf = qf.shape
    lk = kf.shape[1]
    k_x = ex.shape[0]
    grid = (bn, pl.cdiv(lq, block_q))
    kw = {} if not interpret else {"interpret": True}
    return pl.pallas_call(
        (kernel_maker or _make_fwd_kernel)(
            hd, reps, rw_tile, num_sub, max_mode, exp2_impl),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hdf), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, lk, hdf), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, lk, vf.shape[2]), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, k_x), lambda b, i: (b, i, 0)),
            pl.BlockSpec((k_x, lk), lambda b, i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bn, lq, hd), qf.dtype),
            jax.ShapeDtypeStruct((bn, lq, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bn * lq * lk * (hdf + k_x + hd),
            bytes_accessed=(qf.size + kf.size + vf.size + rx.size
                            + ex.size) * qf.dtype.itemsize,
            transcendentals=bn * lq * lk,
        ),
        **kw,
    )(qf, kf, vf, rx, ex)


def _bwd_impl(qf, kf, vs, rx, ex, g, lse, delta, hd, reps, rw_tile,
              block_q, num_sub, max_mode, exp2_impl, interpret,
              kernel_maker=None):
    # kernel_maker: optional drop-in replacement for _make_bwd_kernel
    # (see _fwd_impl)
    bn, lq, hdf = qf.shape
    lk = kf.shape[1]
    k_x = ex.shape[0]
    grid = (bn, pl.cdiv(lq, block_q))
    lq_arr = jnp.full((1,), lq, jnp.int32)
    kw = {} if not interpret else {"interpret": True}
    dkv_fused = DKV_FUSED
    fold_dqdrx = BWD_FOLD_DQ_DRX
    exp2_impl = BWD_EXP2_IMPL or exp2_impl
    if fold_dqdrx:
        # ship [kf | ex^T] as one operand so the kernel's dq and drx
        # products share a single MXU pass (see BWD_FOLD_DQ_DRX)
        kf = jnp.concatenate(
            [kf, jnp.broadcast_to(ex.T[None], (bn, lk, k_x))], axis=-1)
    if dkv_fused:
        acc_shapes = (
            jax.ShapeDtypeStruct((bn, lk, 2 * hd), jnp.float32),  # [dk|dv]
        )
        acc_specs = (
            pl.BlockSpec((1, lk, 2 * hd), lambda b, i, *_: (b, 0, 0)),
        )
    else:
        acc_shapes = (
            jax.ShapeDtypeStruct((bn, lk, hd), jnp.float32),   # dk
            jax.ShapeDtypeStruct((bn, lk, hd), jnp.float32),   # dv
        )
        acc_specs = (
            pl.BlockSpec((1, lk, hd), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, lk, hd), lambda b, i, *_: (b, 0, 0)),
        )
    out_shapes = (
        jax.ShapeDtypeStruct((bn, lq, hdf), jnp.float32),      # dqf
    ) + acc_shapes + (
        jax.ShapeDtypeStruct((bn, lq, k_x), jnp.float32),      # d(expanded)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hdf), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, lk, kf.shape[-1]), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, lk, hd), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, block_q, k_x), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((k_x, lk), lambda b, i, *_: (0, 0)),
            pl.BlockSpec((1, block_q, hd), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, *_: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, hdf), lambda b, i, *_: (b, i, 0)),
        ) + acc_specs + (
            pl.BlockSpec((1, block_q, k_x), lambda b, i, *_: (b, i, 0)),
        ),
    )
    outs = pl.pallas_call(
        (kernel_maker or _make_bwd_kernel)(
            hd, reps, rw_tile, num_sub,
            ragged=bool(lq % block_q),
            clamp=(max_mode == "fixed"),
            exp2_impl=exp2_impl, dkv_fused=dkv_fused,
            tile_bf16=frozenset(BWD_TILE_BF16),
            fold_dqdrx=fold_dqdrx),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        # Mosaic's default 16 MB scoped-VMEM budget rejects the larger
        # sub-tilings (sub1 at bq784 wants 19.6 MB); v5e has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        **kw,
    )(lq_arr, qf, kf, vs, rx, ex, g, lse, delta)
    if dkv_fused:
        dqf, dkv, drx = outs
        return dqf, dkv[..., :hd], dkv[..., hd:], drx
    return outs


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


def _pack_inputs(q, k, rel_h, rel_w, k_size, scale, rw_tile):
    """Build the folded operands (all logit terms pre-scaled by log2e).

    Returns (qf, kf, rx, ex, fold, reps): qf = [q*scale*log2e,
    folded_term*log2e] (bn, lq, hd+k_fold), kf = [k, onehot_fold^T]
    (bn, lk, hd+k_fold), rx = expanded term*log2e, ex its one-hot.
    """
    b, nh, lq, hd = q.shape
    lk = k.shape[2]
    k_h, k_w = k_size
    fold = _fold_axis(hd, k_size)
    if rw_tile and fold != "h":
        raise ValueError("rw_tile expansion requires folding the h axis")
    eh, ew = _expanders(k_h, k_w, str(q.dtype))
    beta = jnp.asarray(LOG2E, q.dtype)
    qs = (q * (jnp.asarray(scale, q.dtype) * beta)).reshape(b * nh, lq, hd)
    ks = k.reshape(b * nh, lk, hd)
    if fold == "h":
        folded, rx, ef, ex, reps = rel_h, rel_w, eh, ew, k_h
    else:
        folded, rx, ef, ex, reps = rel_w, rel_h, ew, eh, k_w
    qf = jnp.concatenate([qs, folded * beta], axis=-1)
    kf = jnp.concatenate(
        [ks, jnp.broadcast_to(ef.T, (b * nh, lk, ef.shape[0]))], axis=-1)
    # zero-pad the contraction to the full 128-lane tile: measured ~7%
    # faster than a 120-lane ragged contraction, and the zero columns
    # contribute nothing
    hdf = qf.shape[-1]
    if hdf < MXU_LANES:
        pad = [(0, 0), (0, 0), (0, MXU_LANES - hdf)]
        qf = jnp.pad(qf, pad)
        kf = jnp.pad(kf, pad)
    return qf, kf, rx * beta, ex, fold, reps


def _flash_core(q, k, v, rph, rpw, q_size, k_size, scale, block_q,
                rw_tile, num_sub, max_mode, bwd_num_sub, exp2_impl):
    """Forward kernel + VJP attachment, restructured for remat.

    The kernel forward runs on ``stop_gradient`` inputs and its outputs
    ``(out, lse)`` are *plain named intermediates* (``checkpoint_name``:
    "attn_kernel_out"/"attn_lse"); the gradient is attached by
    :func:`_attach_vjp`, a ``custom_vjp`` whose residuals are exactly
    ``(q, k, v, rph, rpw, out, lse)``. Why: with the earlier structure
    (custom_vjp wrapping the pallas call), ``jax.checkpoint``'s backward
    recompute had to re-run the forward kernel to regenerate the
    residuals — measured round 3: every remat policy, including
    "save_attn" (which saves the *post-proj* attention output), re-ran
    the 2.3 ms forward kernel per block, which is why save_attn tied
    full remat (713.7 vs 714.4 ms). With out/lse as saveable named
    values, ``save_only_these_names("attn_kernel_out", "attn_lse")``
    lets the recompute drop the kernel forward entirely (the pallas fwd
    call DCEs away) at the same HBM cost as saving the post-proj output.
    """
    sg = jax.lax.stop_gradient
    out, lse = _plain_fwd(sg(q), sg(k), sg(v), sg(rph), sg(rpw), q_size,
                          k_size, scale, block_q, rw_tile, num_sub,
                          max_mode, exp2_impl)
    from jax.ad_checkpoint import checkpoint_name
    out = checkpoint_name(out, "attn_kernel_out")
    lse = checkpoint_name(lse, "attn_lse")
    bbq = BWD_BLOCK_Q or _bwd_block_q_default(q.shape[2], block_q, rw_tile)
    return _attach_vjp(q, k, v, rph, rpw, out, lse, q_size, k_size,
                       float(scale), block_q, rw_tile, num_sub, max_mode,
                       bwd_num_sub, exp2_impl, bbq)


def _bwd_block_q_default(lq, block_q, rw_tile):
    """Backward-only query-tile default.

    At the flagship fold-h shape the unsplit full-L backward tile wins
    (bbq sweep 2026-08-19, B=8 ViT-L save_kernel remat: bbq1568 645.2
    vs fwd-tile 650.3 ms/step; 616 -> 667.4, 392 -> 657.6 — bigger is
    better here; the backward is residency-tolerant once the forward
    kernel is pruned out of it). Unmeasured shapes keep the forward
    tile.
    """
    return lq if (rw_tile and lq == 1568) else block_q


def _plain_fwd(q, k, v, rph, rpw, q_size, k_size, scale, block_q, rw_tile,
               num_sub, max_mode, exp2_impl):
    """Non-differentiable kernel forward -> (out (bn, lq, hd), lse)."""
    b, nh, lq, hd = q.shape
    lk = k.shape[2]
    rel_h, rel_w = _rel_terms(q, rph, rpw, q_size, k_size)
    qf, kf, rx, ex, _, reps = _pack_inputs(q, k, rel_h, rel_w, k_size,
                                           scale, rw_tile)
    vf = jnp.concatenate(
        [v.reshape(b * nh, lk, hd),
         jnp.ones((b * nh, lk, 1), v.dtype)], axis=-1)
    return _fwd_impl(qf, kf, vf, rx, ex, hd, reps, rw_tile, block_q,
                     num_sub, max_mode, exp2_impl, _use_interpret())


# bwd-only query-block override (None = same as the forward's block_q);
# module-level experiment knob, threaded as a nondiff arg at trace time
BWD_BLOCK_Q = None


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15, 16))
def _attach_vjp(q, k, v, rph, rpw, out, lse, q_size, k_size, scale,
                block_q, rw_tile, num_sub, max_mode, bwd_num_sub,
                exp2_impl, bwd_block_q):
    b, nh, lq, hd = q.shape
    return out.reshape(b, nh, lq, hd)


def _attach_fwd(q, k, v, rph, rpw, out, lse, q_size, k_size, scale,
                block_q, rw_tile, num_sub, max_mode, bwd_num_sub,
                exp2_impl, bwd_block_q):
    b, nh, lq, hd = q.shape
    return out.reshape(b, nh, lq, hd), (q, k, v, rph, rpw, out, lse)


def _flash_bwd(q_size, k_size, scale, block_q, rw_tile, num_sub, max_mode,
               bwd_num_sub, exp2_impl, bwd_block_q, res, g):
    q, k, v, rph, rpw, out, lse = res
    b, nh, lq, hd = q.shape
    lk = k.shape[2]
    rel_fn = lambda q_, rph_, rpw_: _rel_terms(q_, rph_, rpw_, q_size,
                                               k_size)
    (rel_h, rel_w), rel_vjp = jax.vjp(rel_fn, q, rph, rpw)
    qf, kf, rx, ex, fold, reps = _pack_inputs(q, k, rel_h, rel_w, k_size,
                                              scale, rw_tile)
    gs = g.reshape(b * nh, lq, hd).astype(q.dtype)
    # delta = rowsum(do * o) == rowsum(dp * p): tiny (L, hd) arrays
    delta = jnp.sum(gs.astype(jnp.float32)
                    * out.astype(jnp.float32), axis=-1, keepdims=True)
    dqf, dk, dv, drx = _bwd_impl(
        qf, kf, v.reshape(b * nh, lk, hd), rx, ex, gs, lse, delta, hd,
        reps, rw_tile, bwd_block_q or block_q, bwd_num_sub, max_mode,
        exp2_impl, _use_interpret())
    k_fold = k_size[0] if fold == "h" else k_size[1]
    dqs, drf = dqf[..., :hd], dqf[..., hd:hd + k_fold]  # drop lane pad
    drh, drw = (drf, drx) if fold == "h" else (drx, drf)
    dq_rel, drph, drpw = rel_vjp((drh.astype(rel_h.dtype),
                                  drw.astype(rel_w.dtype)))
    dq = dqs.reshape(b, nh, lq, hd).astype(q.dtype) \
        * jnp.asarray(scale, q.dtype) + dq_rel
    # the kernel's dk came from the log2e-pre-scaled qf
    dk = dk * jnp.asarray(1.0 / LOG2E, dk.dtype)
    # out/lse enter _attach_vjp behind a stop_gradient (they are values
    # of the non-differentiable forward): their cotangent slots are dead
    return (dq, dk.reshape(b, nh, lk, hd).astype(k.dtype),
            dv.reshape(b, nh, lk, hd).astype(v.dtype),
            drph.astype(rph.dtype), drpw.astype(rpw.dtype),
            jnp.zeros_like(out), jnp.zeros_like(lse))


_attach_vjp.defvjp(_attach_fwd, _flash_bwd)


def flash_attention_relpos(q, k, v, rel_pos_h, rel_pos_w,
                           q_size: Tuple[int, int], k_size: Tuple[int, int],
                           scale: float,
                           block_q: int = None,
                           rw_tile: bool = None,
                           num_sub: int = None,
                           max_mode: str = "fixed",
                           bwd_num_sub: int = None,
                           exp2_impl: str = None,
                           interpret_fallback: bool = True):
    """Fused attention with decomposed rel-pos bias (differentiable).

    q, k, v: (B, nh, L, hd). rel_pos_h/w: (Lh, hd)/(Lw, hd) tables.
    Returns (B, nh, L, hd). Numerics match the XLA path in
    :func:`painter_tpu.ops.attention.attention` (softmax fp32; exp2 of
    log2e-scaled logits == exp). On CPU the same kernels run in the
    Pallas interpreter. ``rw_tile=True`` expands the non-folded rel_w
    term with a VPU lane-tile instead of a one-hot matmul (requires the
    h axis folded); ``num_sub`` interleaved query sub-tiles per block
    overlap VPU softmax with MXU matmuls.

    Defaults are the measured v5e optimum at the 56x28 flagship grid
    (b8 x 16 heads): block_q 784 (392 for short L), rw_tile whenever
    the h axis is the folded one. num_sub (interleaved query sub-tiles
    that overlap one tile's softmax with the next tile's matmul) pays
    only when the softmax still has a max pass: with the fixed-max
    softmax the 2026-08-17 sweep puts bq784/sub1/rw_tile at 2.272 ms vs
    sub4's 2.292 (exact-max optimum was bq784/sub4 at 2.52).

    ``max_mode="fixed"`` (default) skips the forward's per-row max pass
    — exact for |logits| <= 79 nats (see module docstring); "exact"
    restores the guarded softmax.

    ``exp2_impl="native"`` (default) is the stock transcendental;
    ``"poly3"`` is the integer-trick polynomial (see :func:`_exp2`) —
    it wins the isolated softmax-stage microbench but **loses 15% e2e
    on-chip** (the measured rejection is documented in ``_exp2``), so
    it stays opt-in for future shapes/toolchains where the VLIW
    scheduling may differ.
    """
    del interpret_fallback  # auto-detected per backend
    lq = q.shape[2]
    if rw_tile is None:
        rw_tile = _fold_axis(q.shape[3], tuple(k_size)) == "h"
    if num_sub is None:
        if max_mode == "fixed":
            # fixed-max: no VPU max pass left to overlap — sub1 wins on
            # both fold axes (448 sweep 2026-08-17: bq784 sub1 2.272 vs
            # sub4 2.292; 560 sweep: bq616 sub1 6.736 vs sub2 6.751)
            num_sub = 1
        else:
            num_sub = 4 if rw_tile else 2
    if bwd_num_sub is None:
        # Round-3 measurement (save_attn remat, where the recompute ran
        # the forward kernel adjacent to the backward): the unsplit
        # backward won in isolation (6.65 vs 6.87 ms) but lost ~3% e2e —
        # its 19.6 MB VMEM residency starved the pipeline. Round 4
        # re-measured under "save_kernel" remat (no forward kernel left
        # in the backward at all): the landscape flipped — e2e train
        # step sub1 651.6 ms vs sub2 655.1 vs sub4 655.4 (B=8 ViT-L
        # 896x448, 2026-08-18) — so the flagship fold-h default is now
        # the unsplit backward. The fold-w shapes (COCO-eval 560) keep
        # sub2 (their round-3 sweep; not re-measured at 560).
        bwd_num_sub = 1 if rw_tile else 2
    if block_q is None:
        if lq < 784:
            # one sublane-rounded tile. Measured at the ws=14 window
            # shape (L=196, b=64 windows x 16 heads, 2026-08-19): the
            # single 200-row tile is the forward optimum — 2.124 ms/app
            # vs 2.662 (bq104) / 3.447 (bq56) / 2.507 (XLA). The
            # BACKWARD at this shape loses to XLA (fwd+bwd 7.70 vs
            # 5.98 ms/app): one ragged 200-row grid step can't hide the
            # dK/dV accumulator traffic the way 1568-row shapes do —
            # hence attn_impl="auto"'s train-time split (ops/attention).
            block_q = max(8, (lq + 7) // 8 * 8)
        elif lq % 784 == 0:
            block_q = 784  # flagship 448 grid: measured optimum
        else:
            # ragged long-L shapes (e.g. COCO-eval 560: L=2450, fold-w):
            # cap block_q*L ~= the flagship's 784x1568 VMEM working set —
            # the on-chip 560 sweep puts bq616 at 6.74 ms fwd / 20.6 ms
            # fwd+bwd vs the old bq784 default's 7.65 / 57.7 (!) ms; the
            # ceil-div ragged tail itself costs little, oversized logit
            # tiles cost a lot
            block_q = min(784, max(8, int(1.51e6 / lq) // 8 * 8))
    if max_mode not in ("fixed", "exact"):
        raise ValueError(max_mode)
    if exp2_impl is None:
        exp2_impl = "native"
    if exp2_impl not in ("poly3", "native"):
        raise ValueError(exp2_impl)
    return _flash_core(q, k, v, rel_pos_h, rel_pos_w, tuple(q_size),
                       tuple(k_size), float(scale), int(block_q),
                       bool(rw_tile), int(num_sub), str(max_mode),
                       int(bwd_num_sub), str(exp2_impl))
