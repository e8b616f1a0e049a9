"""Measured per-component device-time profiles (forward and backward).

Productizes the measurement methodology behind BASELINE.md's component
tables so the numbers are reproducible on any host, instead of living in
throwaway scripts. The reference has no analogue (its only timing is the
wall-clock ``MetricLogger`` loop, ``Painter/util/misc.py:124-168``); this
is the tool that produced our roofline accounting.

Methodology (validated against traps documented in BASELINE.md):

- **Two-length scan chains.** Each component runs as an on-device
  ``lax.scan`` chain of n applications (data-dependent, so XLA cannot
  CSE/DCE them); per-application time is the *slope* between two chain
  lengths, which cancels fixed dispatch/fetch overhead. Through a relay
  transport, ``block_until_ready`` can acknowledge on enqueue, so the
  only reliable sync is a device->host fetch of a scalar.
- **Backward timing fetches every grad.** XLA dead-code-eliminates dW
  matmuls whose outputs are never used: the fetched scalar is
  ``loss + global_norm(grads)`` so no backward work can be elided.
- **Backward chains mirror the real trunk**: stacked (n, ...) block
  params scanned under ``jax.checkpoint`` with the production remat
  policy, droppath evaluated with a *traced* rate (the real step traces
  the per-block rate from an array, so the bernoulli is computed even
  at drop_path_rate 0.0).

CLI::

    python -m painter_tpu.utils.component_profile --mode fwd,bwd \
        --preset painter_vit_large_patch16_input896x448_win_dec64_8glb_sl1 \
        --batch 8 --dtype bfloat16
"""
from __future__ import annotations

import argparse
import json
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from painter_tpu import configs
from painter_tpu.configs import ModelConfig


# ---------------------------------------------------------------------------
# Timing primitives
# ---------------------------------------------------------------------------

def _fetch_scalar(x) -> float:
    """Device->host sync. The only reliable completion barrier through a
    relay transport (block_until_ready can return on enqueue)."""
    return float(x)


def chain_time(body: Callable, carry, n: int, *consts, reps: int = 3
               ) -> float:
    """Min wall time of an n-application scan chain of ``body``."""

    @jax.jit
    def f(c, *cs):
        out, _ = jax.lax.scan(lambda c_, _: (body(c_, *cs), None), c, None,
                              length=n)
        return jnp.real(jax.tree_util.tree_leaves(out)[0]).ravel()[0]

    _fetch_scalar(f(carry, *consts))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch_scalar(f(carry, *consts))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain_slope_ms(body: Callable, carry, *consts, n1: int = 16,
                   n2: int = 64, reps: int = 3) -> float:
    """Per-application forward time (ms) as the two-length slope."""
    t1 = chain_time(body, carry, n1, *consts, reps=reps)
    t2 = chain_time(body, carry, n2, *consts, reps=reps)
    return (t2 - t1) / (n2 - n1) * 1e3


def _stack_n(tree, n: int):
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (n,) + a.shape).copy(), tree)


def grad_chain_time(body: Callable, carry, consts_tree, n: int,
                    reps: int = 3) -> float:
    """Min wall time of value_and_grad over an n-layer chain.

    ``body(carry, layer_params, rate, key) -> new_carry``; params are
    stacked per layer (mirroring the trunk's (depth, ...) leaves); the
    fetched scalar depends on the loss AND every grad leaf.
    """
    import optax

    stacked = _stack_n(consts_tree, n)
    rates = jnp.zeros((n,), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), n)

    def loss_fn(c0, ps):
        def sbody(c, inp):
            p, rate, key = inp
            return body(c, p, rate, key), None
        out, _ = jax.lax.scan(sbody, c0, (ps, rates, keys))
        return out.astype(jnp.float32).sum() * 1e-9

    vag = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    lv, gr = vag(carry, stacked)
    s = _fetch_scalar(lv) + _fetch_scalar(optax.global_norm(gr))
    if not np.isfinite(s):
        raise FloatingPointError(f"non-finite probe value {s}")
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        lv, gr = vag(carry, stacked)
        _fetch_scalar(lv)
        _fetch_scalar(optax.global_norm(gr))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def grad_chain_slope_ms(body: Callable, carry, consts_tree, n1: int = 16,
                        n2: int = 48, reps: int = 3) -> float:
    """Per-layer forward+backward time (ms) as the two-length slope."""
    t1 = grad_chain_time(body, carry, consts_tree, n1, reps=reps)
    t2 = grad_chain_time(body, carry, consts_tree, n2, reps=reps)
    return (t2 - t1) / (n2 - n1) * 1e3


def grad_repeat_slope_ms(loss_fn: Callable, args: Tuple, n1: int = 1,
                         n2: int = 9, reps: int = 3) -> float:
    """fwd+bwd time of a single-application component.

    ``loss_fn(*args, acc) -> scalar``: chained n times through the
    ``acc`` scalar so XLA cannot CSE applications; slope cancels the
    fixed cost."""
    import optax

    def timed(n):
        def outer(args_):
            acc = jnp.zeros(())
            for _ in range(n):
                acc = acc + loss_fn(*args_, acc)
            return acc
        vag = jax.jit(jax.value_and_grad(outer))
        lv, gr = vag(args)
        s = _fetch_scalar(lv) + _fetch_scalar(optax.global_norm(gr))
        if not np.isfinite(s):
            raise FloatingPointError(f"non-finite probe value {s}")
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            lv, gr = vag(args)
            _fetch_scalar(lv)
            _fetch_scalar(optax.global_norm(gr))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (timed(n2) - timed(n1)) / (n2 - n1) * 1e3


# ---------------------------------------------------------------------------
# Model-component profiles
# ---------------------------------------------------------------------------

def _inputs(cfg: ModelConfig, batch: int):
    from painter_tpu.models import incontext_vit as m

    rng = np.random.RandomState(0)
    gh, gw = cfg.grid_size
    d = cfg.embed_dim
    dt = cfg.compute_dtype
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    x_grid = jnp.asarray(rng.randn(batch, gh, gw, d) * 0.02, dt)
    bp = m._slice_block(params["blocks"], 0)
    return params, bp, x_grid, rng


def profile_forward(cfg: ModelConfig, batch: int = 8,
                    attn_impl: str = "pallas", n1: int = 16, n2: int = 64,
                    reps: int = 3) -> Dict[str, float]:
    """Forward per-component profile (the BASELINE.md inference table)."""
    from painter_tpu.models import incontext_vit as m
    from painter_tpu.ops.norm import layer_norm

    params, bp, x_grid, rng = _inputs(cfg, batch)
    gh, gw = cfg.grid_size
    d = cfg.embed_dim
    dt = cfg.compute_dtype
    L = gh * gw
    out: Dict[str, float] = {}

    out["block_ms"] = chain_slope_ms(
        lambda x, b: m.block_apply(b, x, cfg, attn_impl=attn_impl),
        x_grid, bp, n1=n1, n2=n2, reps=reps)

    out["mlp_ms"] = chain_slope_ms(
        lambda x, b: m._mlp(b["mlp"], x, gelu_approx=cfg.gelu_approximate),
        x_grid, bp, n1=n1, n2=n2, reps=reps)

    out["ln_ms"] = chain_slope_ms(
        lambda x, b: layer_norm(x, b["norm1"]["scale"], b["norm1"]["bias"],
                                cfg.ln_eps),
        x_grid, bp, n1=n1, n2=n2, reps=reps)

    out["qkv_proj_ms"] = chain_slope_ms(
        lambda x, qk, pk: ((x.reshape(batch, L, d) @ qk)[..., :d]
                           @ pk).reshape(batch, gh, gw, d),
        x_grid, bp["attn"]["qkv"]["kernel"].astype(dt),
        bp["attn"]["proj"]["kernel"].astype(dt), n1=n1, n2=n2, reps=reps)

    if cfg.use_rel_pos:
        from painter_tpu.kernels.flash_relpos import flash_attention_relpos
        hd = cfg.head_dim
        q0 = jnp.asarray(rng.randn(batch, cfg.num_heads, L, hd) * 0.02, dt)
        k0 = jnp.asarray(rng.randn(batch, cfg.num_heads, L, hd) * 0.02, dt)
        v0 = jnp.asarray(rng.randn(batch, cfg.num_heads, L, hd) * 0.02, dt)
        rph = params["blocks"]["attn"]["rel_pos_h"][0]
        rpw = params["blocks"]["attn"]["rel_pos_w"][0]
        if attn_impl == "pallas":
            out["flash_kernel_ms"] = chain_slope_ms(
                lambda q, k, v, rh, rw: flash_attention_relpos(
                    q, k, v, rh, rw, (gh, gw), (gh, gw), hd ** -0.5),
                q0, k0, v0, rph, rpw, n1=n1, n2=n2, reps=reps)

    return {k: round(v, 3) for k, v in out.items()}


def profile_backward(cfg: ModelConfig, batch: int = 8,
                     attn_impl: str = "pallas",
                     remat_policy: Optional[str] = "save_kernel",
                     n1: int = 16, n2: int = 48, reps: int = 3,
                     include_single: bool = True) -> Dict[str, float]:
    """Backward (fwd+bwd incl. remat recompute) per-component profile.

    Components mirror the production train step: the full block and the
    attention sub-block run under the given remat policy; the MLP
    sub-block's intermediates are recomputed in backward exactly as the
    save_attn policy does in the real trunk.
    """
    from jax.ad_checkpoint import checkpoint_name

    from painter_tpu.models import incontext_vit as m
    from painter_tpu.ops.attention import attention
    from painter_tpu.ops.norm import layer_norm

    params, bp, x_grid, rng = _inputs(cfg, batch)
    gh, gw = cfg.grid_size
    d = cfg.embed_dim
    dt = cfg.compute_dtype
    L = gh * gw
    nh = cfg.num_heads
    hd = cfg.head_dim
    H, W = cfg.img_size
    out: Dict[str, float] = {}

    names = {"save_attn": ("attn_out",),
             "save_kernel": ("attn_kernel_out", "attn_lse"),
             "save_kernel_attn": ("attn_kernel_out", "attn_lse",
                                  "attn_out"),
             "save_kernel_mlp": ("attn_kernel_out", "attn_lse",
                                 "mlp_fc1"),
             "save_attn_mlp": ("attn_out", "mlp_fc1")}
    if remat_policy is None:
        policy = None
    elif remat_policy in names:
        policy = jax.checkpoint_policies.save_only_these_names(
            *names[remat_policy])
    else:
        raise ValueError(remat_policy)

    def ckpt(fn):
        return jax.checkpoint(fn, policy=policy)

    def block_body(x, p, rate, key):
        fn = lambda bp_, h_: m.block_apply(
            bp_, h_, cfg, dpr=rate, train=True, rng=key,
            attn_impl=attn_impl)
        return ckpt(fn)(p, x)

    def emit(key, val):
        out[key] = val
        print(f"BWD[{key}] {val:.3f} ms", flush=True)

    emit("block_ms", grad_chain_slope_ms(block_body, x_grid, bp,
                                         n1=n1, n2=n2, reps=reps))

    def attn_sub_body(x, p, rate, key):
        def fn(bp_, h_):
            xn = layer_norm(h_, bp_["norm1"]["scale"],
                            bp_["norm1"]["bias"], cfg.ln_eps)
            rel = ((bp_["attn"]["rel_pos_h"], bp_["attn"]["rel_pos_w"])
                   if cfg.use_rel_pos else None)
            att = attention(xn, bp_["attn"], nh, (gh, gw), rel_pos=rel,
                            impl=attn_impl)
            att = checkpoint_name(att, "attn_out")
            return h_ + m._drop_path(att, rate, key, True)
        return ckpt(fn)(p, x)

    emit("attn_sub_ms", grad_chain_slope_ms(
        attn_sub_body, x_grid, {"norm1": bp["norm1"], "attn": bp["attn"]},
        n1=n1, n2=n2, reps=reps))

    def mlp_sub_body(x, p, rate, key):
        def fn(bp_, h_):
            xn = layer_norm(h_, bp_["norm2"]["scale"],
                            bp_["norm2"]["bias"], cfg.ln_eps)
            xm = m._mlp(bp_["mlp"], xn, gelu_approx=cfg.gelu_approximate)
            return h_ + m._drop_path(xm, rate, key, True)
        return ckpt(fn)(p, x)

    emit("mlp_sub_ms", grad_chain_slope_ms(
        mlp_sub_body, x_grid, {"norm2": bp["norm2"], "mlp": bp["mlp"]},
        n1=n1, n2=n2, reps=reps))

    if cfg.use_rel_pos and attn_impl == "pallas":
        from painter_tpu.kernels.flash_relpos import flash_attention_relpos

        kv = {
            "k": jnp.asarray(rng.randn(batch, nh, L, hd) * 0.02, dt),
            "v": jnp.asarray(rng.randn(batch, nh, L, hd) * 0.02, dt),
            "rh": params["blocks"]["attn"]["rel_pos_h"][0],
            "rw": params["blocks"]["attn"]["rel_pos_w"][0],
        }
        q0 = jnp.asarray(rng.randn(batch, nh, L, hd) * 0.02, dt)

        def kernel_body(q, p, rate, key):
            del rate, key
            return flash_attention_relpos(
                q, p["k"], p["v"], p["rh"], p["rw"], (gh, gw), (gh, gw),
                hd ** -0.5)

        # the bare-kernel chain runs WITHOUT remat, so every layer holds
        # its full custom-vjp residuals (~103 MB at ViT-L b8): cap the
        # long chain at 24 layers — 48 exhausted the 16 GB v5e
        emit("kernel_ms", grad_chain_slope_ms(
            kernel_body, q0, kv, n1=min(n1, 8), n2=min(n2, 24),
            reps=reps))

    if include_single:
        from painter_tpu.models.incontext_vit import (forward_decoder,
                                                      forward_loss)

        dec_params = {"decoder_embed": params["decoder_embed"],
                      "decoder_pred": params["decoder_pred"]}

        def dec_loss(dp_, xg, acc):
            pred = forward_decoder(
                dp_, cfg, [xg + acc.astype(dt) * 1e-20] * 4)
            return pred.astype(jnp.float32).sum() * 1e-9

        # n2=5: nine chained full decoders (~400 MB of conv temps each)
        # exhausted HBM after the longer kernel chains of this run
        emit("decoder_ms", grad_repeat_slope_ms(
            dec_loss, (dec_params, x_grid), n2=5, reps=reps))

        imgs = jnp.asarray(rng.randn(batch, H, W, 3), jnp.float32)
        tgts = jnp.asarray(rng.randn(batch, H, W, 3), jnp.float32)
        mask = jnp.broadcast_to(
            jnp.zeros((L,)).at[L // 2:].set(1.0), (batch, L)).copy()
        valid = jnp.ones((batch, H, W, 3), jnp.float32)
        pred_fake = jnp.asarray(rng.randn(batch, H, W, 3) * 0.1,
                                jnp.float32)

        def loss_only(tg, acc):
            return forward_loss(cfg, pred_fake + acc * 1e-20, tg, mask,
                                valid)

        emit("loss_ms", grad_repeat_slope_ms(loss_only, (tgts,),
                                             reps=reps))

        kern = params["patch_embed"]["kernel"]
        bias = params["patch_embed"]["bias"]

        def embed_loss(im, acc):
            y = jax.lax.conv_general_dilated(
                (im + acc * 1e-20).astype(dt), kern.astype(dt),
                (cfg.patch_size, cfg.patch_size), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return (y + bias.astype(dt)).astype(jnp.float32).sum() * 1e-9

        emit("patch_embed_ms", grad_repeat_slope_ms(embed_loss, (imgs,),
                                                    reps=reps))

    return {k: round(v, 3) for k, v in out.items()}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--preset", default=(
        "painter_vit_large_patch16_input896x448_win_dec64_8glb_sl1"))
    ap.add_argument("--mode", default="fwd,bwd",
                    help="comma list of fwd,bwd")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--attn_impl", default="pallas",
                    choices=["pallas", "xla"])
    ap.add_argument("--remat_policy", default="save_kernel",
                    help="bwd-mode remat policy (save_kernel is the "
                         "round-4 production default)")
    ap.add_argument("--n1", type=int, default=16)
    ap.add_argument("--n2", type=int, default=0,
                    help="0 = 64 for fwd, 48 for bwd")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    from painter_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = configs.get_config(args.preset, dtype=args.dtype,
                             drop_path_rate=0.0)
    result: Dict[str, Any] = {"preset": args.preset, "batch": args.batch,
                              "dtype": args.dtype,
                              "attn_impl": args.attn_impl}
    modes = args.mode.split(",")
    if "fwd" in modes:
        result["fwd"] = profile_forward(
            cfg, args.batch, args.attn_impl, n1=args.n1,
            n2=args.n2 or 64, reps=args.reps)
        print("FWD " + json.dumps(result["fwd"]), flush=True)
    if "bwd" in modes:
        result["bwd"] = profile_backward(
            cfg, args.batch, args.attn_impl,
            remat_policy=args.remat_policy, n1=args.n1,
            n2=args.n2 or 48, reps=args.reps)
        print("BWD " + json.dumps(result["bwd"]), flush=True)
    print("PROFILE " + json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main()
