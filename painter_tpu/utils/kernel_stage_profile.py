"""Stage-marginal profiles of the flash attention kernel (fwd and bwd).

Productizes the round-4 methodology that re-attributed the kernel's
roofline (BASELINE.md "stage-marginal profile" sections): stage-dropped
variants of the production kernels — each variant removes one more stage
from the end of the dependency chain — are threaded through
:func:`flash_relpos._fwd_impl` / ``_bwd_impl``'s ``kernel_maker``
parameter, and the difference between successive variants is that
stage's *as-executed marginal cost* (which is ~zero for any stage the
Mosaic VLIW scheduler fully overlaps with the MXU, e.g. the exp2 pass in
both directions).

Variant outputs are garbage for the dropped stages — this tool times,
it does not compute. Parity of the real kernels is covered by
tests/test_flash_relpos.py; this module never touches production paths
(no module globals are patched — concurrent in-process traces always
compile the real kernels).

Measured flagship findings this tool reproduces (v5e, 2026-08-19):
fwd floor (QK matmul + streaming) 3.14 of 3.88 ms with exp2/recip
marginal ~0/0.14 ms; bwd floor 5.22 of 6.69 ms with dv/dk/dp+ds
marginals 0.38/0.46/0.63 ms and exp2/drx free. Both directions are
bound by QK-family matmul pacing (~26-31 TFLOPS emitting (bq, L) fp32
logit tiles), not VPU work.

CLI::

    python -m painter_tpu.utils.kernel_stage_profile \
        [--qh 56 --qw 28 --batch 8 --heads 16 --iters 10]
"""
from __future__ import annotations

import argparse
import json
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import painter_tpu.kernels.flash_relpos as fr

FWD_STAGES = ("full", "no_recip", "no_exp2", "qk_only")
BWD_STAGES = ("full", "no_dv", "no_dkv", "no_drx", "dq_from_p",
              "no_exp2", "qk_only")


def _make_fwd_variant(stage: str) -> Callable:
    """Forward kernel builder with stages after ``stage`` dropped."""
    def maker(hd, reps, rw_tile, num_sub, max_mode, exp2_impl):
        if max_mode != "fixed" or not rw_tile:
            raise NotImplementedError(
                "stage profile covers the fixed-max fold-h path")

        def kern(qf_ref, kf_ref, vf_ref, rx_ref, ex_ref, o_ref, lse_ref):
            qf = qf_ref[0]
            kf = kf_ref[0]
            vf = vf_ref[0]
            s = fr._dot(qf, kf, trans_b=True)
            if stage == "qk_only":
                o_ref[0] = s[:, :hd].astype(o_ref.dtype)
                lse_ref[0] = s[:, :1]
                return
            s += jnp.tile(rx_ref[0], (1, reps)).astype(jnp.float32)
            if stage == "no_exp2":
                e = s.astype(vf.dtype)
            else:
                e = fr._exp2(jnp.minimum(s, fr.EXP2_CLAMP),
                             exp2_impl).astype(vf.dtype)
            ov = fr._dot(e, vf)
            if stage == "no_recip":
                o_ref[0] = ov[:, :hd].astype(o_ref.dtype)
                lse_ref[0] = ov[:, hd:hd + 1]
                return
            denom = jnp.maximum(ov[:, hd:hd + 1], 1e-37)
            o_ref[0] = (ov[:, :hd] * pl.reciprocal(
                denom, approx=False)).astype(o_ref.dtype)
            lse_ref[0] = jnp.log2(denom)
        return kern
    return maker


def _make_bwd_variant(stage: str) -> Callable:
    """Backward kernel builder with stages after ``stage`` dropped."""
    def maker(hd, reps, rw_tile, num_sub, ragged, clamp, exp2_impl,
              dkv_fused, tile_bf16=frozenset(), fold_dqdrx=False):
        del tile_bf16  # stage variants time the fp32-tile production path
        if ragged or dkv_fused or not rw_tile or fold_dqdrx:
            raise NotImplementedError(
                "stage profile covers the unfused non-ragged fold-h path")

        def kern(lq_ref, qf_ref, kf_ref, v_ref, rx_ref, ex_ref,
                 do_ref, lse_ref, delta_ref,
                 dqf_ref, dk_ref, dv_ref, drx_ref):
            i = pl.program_id(1)

            @pl.when(i == 0)
            def _():
                dk_ref[0] = jnp.zeros_like(dk_ref[0])
                dv_ref[0] = jnp.zeros_like(dv_ref[0])
                drx_ref[0] = jnp.zeros_like(drx_ref[0])

            qf = qf_ref[0]
            kf = kf_ref[0]
            do = do_ref[0]
            s = fr._dot(qf, kf, trans_b=True)
            if stage == "qk_only":
                dqf_ref[0] = fr._dot(s.astype(qf.dtype), kf).astype(
                    dqf_ref.dtype)
                return
            s += jnp.tile(rx_ref[0], (1, reps)).astype(jnp.float32)
            if stage == "no_exp2":
                p = s - lse_ref[0]
            else:
                if clamp:
                    s = jnp.minimum(s, fr.EXP2_CLAMP)
                p = fr._exp2(s - lse_ref[0], exp2_impl)
            if stage in ("dq_from_p", "no_exp2"):
                dqf_ref[0] = fr._dot(p.astype(qf.dtype), kf).astype(
                    dqf_ref.dtype)
                return
            dp = fr._dot(do, v_ref[0], trans_b=True)
            ds = p * (dp - delta_ref[0])
            ds_b = ds.astype(qf.dtype)
            dqf_ref[0] = fr._dot(ds_b, kf).astype(dqf_ref.dtype)
            if stage == "no_drx":
                return
            drx_ref[0] = fr._dot(ds_b, ex_ref[:], trans_b=True).astype(
                drx_ref.dtype)
            if stage == "no_dkv":
                return
            dk_ref[0] += fr._dot(ds_b, qf[:, :hd], trans_a=True)
            if stage == "no_dv":
                return
            dv_ref[0] += fr._dot(p.astype(qf.dtype), do, trans_a=True)
        return kern
    return maker


def _timed(fn: Callable, args, reps: int, iters: int) -> float:
    """Pipelined min-of-reps ms/call with a device->host fetch barrier
    (block_until_ready can acknowledge on enqueue through a relay)."""
    def fetch(out):
        return float(np.asarray(jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out,
            jnp.float32(0))))

    fetch(fn(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best * 1e3


def profile(qh: int = 56, qw: int = 28, batch: int = 8, heads: int = 16,
            head_dim: int = 64, block_q: int | None = None,
            iters: int = 10, reps: int = 3, seed: int = 0
            ) -> Dict[str, Dict[str, float]]:
    """Run both stage-marginal profiles; returns {fwd: {...}, bwd: {...}}
    of ms-per-call keyed by variant name (see module docstring)."""
    qs = ks = (qh, qw)
    length = qh * qw
    if length < head_dim:
        raise ValueError("qk_only variant needs L >= head_dim")
    rng = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.3, jnp.bfloat16)
    q, k, v = (mk(batch, heads, length, head_dim) for _ in range(3))
    g = mk(batch, heads, length, head_dim)
    rph, rpw = mk(2 * qh - 1, head_dim), mk(2 * qw - 1, head_dim)
    scale = head_dim ** -0.5
    bq = block_q or (784 if length % 784 == 0 else length)
    interpret = fr._use_interpret()

    rel_h, rel_w = fr._rel_terms(q, rph, rpw, qs, ks)
    qf, kf, rx, ex, fold, reps_ = fr._pack_inputs(q, k, rel_h, rel_w, ks,
                                                  scale, True)
    if fold != "h":
        raise NotImplementedError("stage profile covers the fold-h path")
    vf = jnp.concatenate(
        [v.reshape(batch * heads, length, head_dim),
         jnp.ones((batch * heads, length, 1), v.dtype)], axis=-1)
    vs = v.reshape(batch * heads, length, head_dim)
    gs = g.reshape(batch * heads, length, head_dim)
    out, lse = fr._plain_fwd(q, k, v, rph, rpw, qs, ks, scale, bq, True,
                             1, "fixed", "native")
    delta = jnp.sum(gs.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)

    results: Dict[str, Dict[str, float]] = {"fwd": {}, "bwd": {}}
    fargs = (qf, kf, vf, rx, ex)
    bargs = (qf, kf, vs, rx, ex, gs, lse, delta)
    # stage-dropped builders are threaded through the production impls'
    # kernel_maker parameter — module globals are never touched, so
    # concurrent in-process kernel traces stay on the real kernels
    for stage in FWD_STAGES:
        maker = _make_fwd_variant(stage)
        fn = jax.jit(lambda *a, _m=maker: fr._fwd_impl(
            *a, head_dim, reps_, True, bq, 1, "fixed", "native",
            interpret, kernel_maker=_m))
        t = _timed(fn, fargs, reps, iters)
        results["fwd"][stage] = round(t, 3)
        print(f"fwd {stage}: {t:.3f} ms", flush=True)
    for stage in BWD_STAGES:
        maker = _make_bwd_variant(stage)
        fn = jax.jit(lambda *a, _m=maker: fr._bwd_impl(
            *a, head_dim, reps_, True, length, 1, "fixed", "native",
            interpret, kernel_maker=_m))
        t = _timed(fn, bargs, reps, iters)
        results["bwd"][stage] = round(t, 3)
        print(f"bwd {stage}: {t:.3f} ms", flush=True)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--qh", type=int, default=56)
    ap.add_argument("--qw", type=int, default=28)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--block_q", type=int, default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)
    results = profile(args.qh, args.qw, args.batch, args.heads,
                      block_q=args.block_q, iters=args.iters,
                      reps=args.reps)
    print("STAGE_PROFILE " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
