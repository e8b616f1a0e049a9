"""Optimizer: AdamW + BEiT layer-wise lr decay + per-iter cosine schedule.

Reference recipe (``Painter/train_painter_vit_large.sh:14-19``,
``main_train.py:344-348``, ``util/lr_decay.py``, ``util/lr_sched.py``):
AdamW betas (0.9, 0.999), weight decay 0.1 on non-1D params (pos_embed
excluded), grad-clip 3.0, absolute lr 1e-3, layer_decay 0.8, half-cycle
cosine on fractional epochs with linear warmup, lr adjusted once per
accumulation boundary.

TPU-native twist: block params are stacked (depth, ...), so the per-layer
lr scale is applied as a broadcast (depth, 1, ...) vector over axis 0 of
each block leaf instead of 25 torch param groups.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from painter_tpu.configs import ModelConfig


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-3
    min_lr: float = 0.0
    weight_decay: float = 0.1  # main_train.py:91 + train_painter_vit_large.sh
    layer_decay: float = 0.8
    clip_grad: Optional[float] = 3.0
    betas: tuple = (0.9, 0.999)
    eps: float = 1e-8
    warmup_epochs: float = 1.0
    epochs: float = 15.0
    steps_per_epoch: int = 1000  # optimizer updates per epoch


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def decay_mask(params: Any) -> Any:
    """True where weight decay applies.

    Mirrors ``param_groups_lrd`` (lr_decay.py:32): decay on everything
    except torch-1D params (biases, norm scales) and the no-decay list
    {pos_embed}. The mask/segment/type tokens are (1,1,1,C) in torch, so
    they DO get weight decay — reproduced here even though our leaves are
    (C,).
    """
    def fn(path, leaf):
        p = _path_str(path)
        if p == "pos_embed":
            return False
        if p.endswith("bias"):
            return False
        if "norm" in p or p.endswith("ln/scale") or p.endswith("ln/bias"):
            return False
        return True
    return jax.tree_util.tree_map_with_path(fn, params)


def layer_lr_scales(params: Any, cfg: ModelConfig, layer_decay: float) -> Any:
    """Per-leaf lr-scale pytree (vectors over axis 0 for stacked blocks).

    Mirrors ``get_layer_id_for_vit`` (lr_decay.py:64-76): pos_embed /
    patch_embed -> layer 0; blocks.i -> i+1; everything else ->
    num_layers (scale 1.0). num_layers = depth + 1.
    """
    num_layers = cfg.depth + 1

    def fn(path, leaf):
        p = _path_str(path)
        if p == "pos_embed" or p.startswith("patch_embed"):
            return jnp.asarray(layer_decay ** num_layers, jnp.float32)
        if p.startswith("blocks"):
            scales = layer_decay ** (num_layers - 1 - np.arange(cfg.depth))
            shape = (cfg.depth,) + (1,) * (leaf.ndim - 1)
            return jnp.asarray(scales, jnp.float32).reshape(shape)
        return jnp.asarray(1.0, jnp.float32)

    return jax.tree_util.tree_map_with_path(fn, params)


def scale_by_layer_decay(params: Any, cfg: ModelConfig,
                         layer_decay: float) -> optax.GradientTransformation:
    scales = layer_lr_scales(params, cfg, layer_decay)

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda u, s: u * s.astype(u.dtype), updates, scales)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def cosine_warmup_schedule(oc: OptimConfig):
    """Half-cycle cosine on fractional epoch with linear warmup

    (lr_sched.py:9-21, evaluated once per optimizer update)."""
    warmup_steps = oc.warmup_epochs * oc.steps_per_epoch
    total_steps = oc.epochs * oc.steps_per_epoch

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = oc.lr * step / jnp.maximum(warmup_steps, 1.0)
        progress = (step - warmup_steps) / jnp.maximum(
            total_steps - warmup_steps, 1.0)
        cos = oc.min_lr + (oc.lr - oc.min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def lars(learning_rate: float = 0.0, weight_decay: float = 0.0,
         momentum: float = 0.9) -> optax.GradientTransformation:
    """LARS — present-but-unused alternative optimizer, mirroring

    ``Painter/util/lars.py`` (MoCo v3). optax ships the trust-ratio
    implementation; exposed here for CLI parity."""
    return optax.lars(learning_rate, weight_decay=weight_decay,
                      momentum=momentum)


def make_optimizer(params: Any, cfg: ModelConfig,
                   oc: OptimConfig) -> optax.GradientTransformation:
    parts = []
    if oc.clip_grad is not None:
        parts.append(optax.clip_by_global_norm(oc.clip_grad))
    parts += [
        optax.scale_by_adam(b1=oc.betas[0], b2=oc.betas[1], eps=oc.eps),
        optax.add_decayed_weights(oc.weight_decay, mask=decay_mask(params)),
        scale_by_layer_decay(params, cfg, oc.layer_decay),
        optax.scale_by_learning_rate(cosine_warmup_schedule(oc)),
    ]
    return optax.chain(*parts)
