"""Device mesh and sharding rules — the TPU-native replacement for the
reference's DDP/NCCL runtime (SURVEY.md §2.8/§5.8).

The reference's only parallelism is data-parallel DDP over 64 GPUs with
gradient accumulation and optional DeepSpeed ZeRO-1
(``Painter/main_train.py:339-341``, ``util/misc.py:217-249,391-444``).
Here that becomes a ``jax.sharding.Mesh`` with axes:

- ``dp``: pure data parallelism (params replicated; XLA all-reduces grads
  over ICI, replacing DDP's NCCL all-reduce);
- ``fsdp``: optimizer/parameter sharding along one axis of each large
  leaf (the ZeRO-1/3-style upgrade; XLA inserts all-gather /
  reduce-scatter).

The global batch is sharded over (dp, fsdp) jointly.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: Optional[int] = None, n_fsdp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_dp is None:
        n_dp = n // n_fsdp
    assert n_dp * n_fsdp == n, (n_dp, n_fsdp, n)
    arr = np.asarray(devices).reshape(n_dp, n_fsdp)
    return Mesh(arr, ("dp", "fsdp"))


def batch_spec() -> P:
    """Shard the leading (batch) axis over every device."""
    return P(("dp", "fsdp"))


def param_spec(leaf: Any, fsdp_size: int) -> P:
    """Shard the largest divisible axis of a param leaf over ``fsdp``.

    Stacked block leaves have a leading ``depth`` axis; we prefer the
    largest trailing axis so each block's math stays local. Leaves with no
    divisible axis are replicated.
    """
    shape = leaf.shape
    if fsdp_size == 1 or not shape:
        return P()
    # prefer the last, then the largest, divisible axis (skip tiny axes)
    candidates = [i for i in range(len(shape))
                  if shape[i] % fsdp_size == 0 and shape[i] >= 128]
    if not candidates:
        return P()
    best = max(candidates, key=lambda i: (shape[i], i))
    spec = [None] * len(shape)
    spec[best] = "fsdp"
    return P(*spec)


def param_shardings(params: Any, mesh: Mesh):
    fsdp = mesh.shape["fsdp"]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, param_spec(leaf, fsdp)), params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def shard_params(params: Any, mesh: Mesh):
    """Place a host pytree onto the mesh with fsdp shardings."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


# ---------------------------------------------------------------------------
# Pallas-kernel sharding wrapper
# ---------------------------------------------------------------------------

def shard_batch0_kernel(fn, n_batch_args: int, n_rep_args: int,
                        kernel_mesh: Optional[tuple]):
    """shard_map a Pallas kernel call over the batch dim of a mesh.

    GSPMD cannot auto-partition Mosaic custom calls: lowering a Pallas
    kernel inside a jit whose ShardingContext spans >1 device raises
    NotImplementedError ("wrap the call in a shard_map",
    jax/_src/tpu_custom_call.py). Every multi-device entry point (train
    step with a mesh, dp-serving engine) therefore threads
    ``kernel_mesh = (mesh, batch_axes)`` down to the kernel call sites
    (ops/attention.py pallas branch, ops/quant.py fused MLP), which
    wrap themselves with this helper: the first ``n_batch_args`` args
    are sharded on dim 0 over ``batch_axes`` — ("dp",) for serving,
    ("dp", "fsdp") for the train step — and the next ``n_rep_args``
    are replicated. check_vma=False grads through a replicated-spec
    input (the rel-pos tables) are exact on this JAX — verified against
    the unsharded grad in tests/test_multichip_vitl.py. No-op when
    ``kernel_mesh`` is None (single device)."""
    if kernel_mesh is None:
        return fn
    mesh, axes = kernel_mesh
    in_specs = (P(tuple(axes)),) * n_batch_args + (P(),) * n_rep_args
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=P(tuple(axes)), check_vma=False)
