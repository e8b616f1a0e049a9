"""Jitted training step: fwd/bwd + accumulation + optimizer, mesh-sharded.

Replaces the reference's per-iteration loop (``Painter/engine_train.py:34-144``):
DDP gradient all-reduce becomes XLA-inserted collectives from sharding
annotations; fp16 AMP + GradScaler becomes bf16 compute with fp32 params
(documented deviation, SURVEY.md §2.8 — no loss scaler needed in bf16);
gradient accumulation is a ``lax.scan`` over a leading microbatch axis.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from painter_tpu.configs import ModelConfig
from painter_tpu.models import incontext_vit as model_lib


def init_train_state(params: Any,
                     optimizer: optax.GradientTransformation) -> Dict:
    return {
        "params": params,
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def make_train_step(cfg: ModelConfig, optimizer: optax.GradientTransformation,
                    accum_iter: int = 1, remat: bool = True,
                    remat_policy=None, attn_impl: str = "xla", mesh=None,
                    decoder_impl: str = "auto"):
    """Returns step(state, batch, rng) -> (state, metrics).

    batch: dict with 'imgs', 'tgts' (B, H, W, 3), 'mask' (B, L),
    'valid' (B, H, W, 3), optional 'seg_type' (B, 1). With accum_iter > 1
    every leaf carries a leading (accum_iter,) microbatch axis.
    decoder_impl "auto" resolves to "xla": the fused Pallas decoder tail
    (kernels/decoder_head.py) is implemented and parity-tested but
    measured on-par with XLA's own lowering at the B=8 ViT-L shape on
    v5e (both are layout/DMA-bound, not FLOP-bound), so the plain path
    stays the default; "fused" selects the kernel explicitly; "packed"
    is the W-pair channel-packed tail (measured-and-rejected at −4%
    e2e, see incontext_vit._decoder_tail_packed).
    """
    if decoder_impl == "auto":
        decoder_impl = "xla"

    act_constraint = None
    kernel_mesh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # Pallas kernels inside the step must run under shard_map on a
        # multi-device mesh (GSPMD can't partition Mosaic custom calls;
        # parallel.mesh.shard_batch0_kernel)
        if len(mesh.devices.flat) > 1:
            kernel_mesh = (mesh, ("dp", "fsdp"))

        def act_constraint(x):
            spec = P(("dp", "fsdp"), *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec))

    def loss_fn(params, micro, rng):
        loss, _, _ = model_lib.forward(
            params, cfg, micro["imgs"], micro["tgts"], micro["mask"],
            micro["valid"], seg_type=micro.get("seg_type"),
            train=True, rng=rng, remat=remat, remat_policy=remat_policy,
            attn_impl=attn_impl, act_constraint=act_constraint,
            decoder_impl=decoder_impl, kernel_mesh=kernel_mesh)
        return loss

    grad_fn = jax.value_and_grad(loss_fn)

    def train_step(state, batch, rng):
        params = state["params"]

        if accum_iter > 1:
            def micro_step(carry, inp):
                gsum, lsum = carry
                micro, key = inp
                loss, grads = grad_fn(params, micro, key)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                return (gsum, lsum + loss), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params)
            keys = jax.random.split(rng, accum_iter)
            (gsum, lsum), _ = jax.lax.scan(
                micro_step, (zeros, jnp.zeros(())), (batch, keys))
            grads = jax.tree_util.tree_map(lambda g: g / accum_iter, gsum)
            loss = lsum / accum_iter
        else:
            loss, grads = grad_fn(params, batch, rng)

        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              params)
        params = optax.apply_updates(params, updates)
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return new_state, metrics

    return train_step


def make_eval_step(cfg: ModelConfig, attn_impl: str = "xla"):
    """Masked-loss validation step (``engine_train.py:147-203``)."""

    def eval_step(params, batch):
        loss, _, _ = model_lib.forward(
            params, cfg, batch["imgs"], batch["tgts"], batch["mask"],
            batch["valid"], seg_type=batch.get("seg_type"), train=False)
        return {"loss": loss}

    return eval_step
