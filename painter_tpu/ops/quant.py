"""Int8 (w8a8) quantized serving path — a TPU-native beyond-reference mode.

The reference (baaivision/Painter) serves fp16/fp32 only; nothing there
to port. This module exists because the v5e MXU runs int8xint8->int32
matmuls at 2x the bf16 rate (measured on this chip: 308 TOPS vs 185
TFLOPS on the ViT-L fc1 shape (12544, 1024)@(1024, 4096), dequant
epilogue fused for free — /tmp/r3c/int8_micro4.py, 2026-08-17), and the
inference roofline (BASELINE.md) is gemm-pace-bound: the MLP alone is
210.5 of 419 GFLOP as-executed per block application (corrected
accounting, BASELINE.md:117-131 — earlier editions double-counted the
MLP at 411/619).

Scheme — the standard dynamic-activation PTQ recipe:
- **Weights**: symmetric per-out-channel int8, quantized once at load
  time by :func:`quantize_params` (host-side numpy; stacked ``(depth,
  K, N)`` block leaves keep their leading depth axis so the encoder's
  ``lax.scan`` over blocks is untouched). A quantized linear's param
  dict is ``{"kernel_q": int8 (..., K, N), "scale": f32 (..., N),
  "bias": f32 (..., N)}`` — the fp ``kernel`` leaf is *replaced*, so
  the transformed pytree is serving-only (no gradients flow through
  ``round``; the training path never sees it).
- **Activations**: symmetric per-token (per-row) dynamic int8 — absmax
  over the contraction axis in fp32, scale = absmax/127. Per-token
  scales cost one VPU reduce + one elementwise pass per gemm input
  (~0.2 ms per ViT-L block app at b8, vs the ~1.5 ms the int8 MXU rate
  saves) and are what keeps this checkpoint-faithful enough to serve:
  outlier tokens only perturb their own row's step size.
- **Dequant**: the int32 accumulator is scaled by the rank-1 outer
  product ``row_scale * col_scale`` and cast back to the compute dtype
  — XLA fuses this into the matmul epilogue (measured free).

Quantized sites — **MLP fc1/fc2 only, by measurement**. Canonical
numbers (guarded fetch-synced harness, min-of-3 x 10-iter chained
loops, docs/measurements/ROUND5.md 2026-08-19): bf16 52.01 pairs/s b8,
int8 mlp-only 56.04 (+7.7%), fused-kernel MLP 54.12 (a measured LOSS
vs XLA's unfused int8 gemms — ``MLP_IMPL="fused"`` stays opt-in). The
earlier pre-guard A/B (2026-08-17, /tmp logs now superseded) had read
+16% with a tie for the fused kernel; the site *selection* it
established still holds: adding decoder_embed or qkv/proj measured
strictly worse — their per-token act-quant + dequant passes are extra
VPU/HBM traffic on gemms that are each <0.5 ms (qkv/proj already run at
~130 TFLOPS and are 7% of a block; decoder_embed's (12544,16384) int32
epilogue adds an HBM-scale pass to a stage that is DMA-bound). The MLP
is 210.5 of 419 GFLOP as-executed per block app (half the FLOPs;
BASELINE.md:117-131), exactly where the 2x int8 MXU rate pays. LayerNorms, softmax (fp32, unchanged), and the attention QK/PV
contractions inside the Pallas kernel (bf16 — their logits feed a fp32
softmax whose inputs must stay sub-LSB-accurate) are never quantized;
"attn" and "dec" remain selectable targets for experiments.

Use: ``params_q = quantize_params(params)`` then call any inference
entry point (``predict_image`` / ``predict_query_half[_batch]`` /
engines) with ``params_q`` — the gemm helpers dispatch on the presence
of ``kernel_q``. Serving CLIs expose it as ``--quant int8``.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_Q_TARGET_PATHS = (
    ("blocks", "attn", "qkv"),
    ("blocks", "attn", "proj"),
    ("blocks", "mlp", "fc1"),
    ("blocks", "mlp", "fc2"),
    ("decoder_embed",),
)


def quantize_linear_params(lp: Params) -> Params:
    """fp linear params {kernel, bias} -> int8 {kernel_q, scale, bias}.

    Symmetric per-out-channel: absmax over the contraction (second-to-
    last) axis. Leading stacked axes (depth, ...) pass through.
    """
    k = np.asarray(lp["kernel"], np.float32)
    amax = np.max(np.abs(k), axis=-2, keepdims=True)
    scale = np.maximum(amax, 1e-20) / 127.0
    kq = np.clip(np.rint(k / scale), -127, 127).astype(np.int8)
    return {
        "kernel_q": jnp.asarray(kq),
        "scale": jnp.asarray(np.squeeze(scale, axis=-2)),
        "bias": lp["bias"],
    }


#: Measured-optimal default (see module docstring): MLP gemms only.
DEFAULT_TARGETS = ("mlp",)


def quantize_params(params: Params,
                    targets: Iterable[str] = DEFAULT_TARGETS,
                    ) -> Params:
    """Return a serving param pytree with target gemm weights in int8.

    targets: any of "attn" (qkv + proj), "mlp" (fc1 + fc2), "dec"
    (decoder_embed). Default is the measured-optimal "mlp" only —
    "attn"/"dec" are measured e2e regressions on the v5e (module
    docstring). Untargeted leaves are shared, not copied.
    """
    targets = set(targets)
    sel = {
        "attn": [p for p in _Q_TARGET_PATHS if "attn" in p],
        "mlp": [p for p in _Q_TARGET_PATHS if "mlp" in p],
        "dec": [("decoder_embed",)],
    }
    unknown = targets - set(sel)
    if unknown:
        raise ValueError(f"unknown quant targets {sorted(unknown)}")
    out = dict(params)

    def _replace(d: Params, path):
        d = dict(d)
        if len(path) == 1:
            d[path[0]] = quantize_linear_params(d[path[0]])
        else:
            d[path[0]] = _replace(d[path[0]], path[1:])
        return d

    for t in sorted(targets):
        for path in sel[t]:
            cur = out
            ok = True
            for kpart in path:
                if kpart not in cur:
                    ok = False
                    break
                cur = cur[kpart]
            if ok:
                out = _replace(out, path)
    return out


def is_quantized(lp: Params) -> bool:
    return "kernel_q" in lp


def int8_linear(x: jnp.ndarray, lp: Params) -> jnp.ndarray:
    """w8a8 linear: dynamic per-token activation quant, int8 MXU matmul,
    fused rank-1 dequant epilogue. x (..., K) -> (..., N)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    inv = 127.0 / jnp.maximum(amax, 1e-20)
    xq = jnp.clip(jnp.round(xf * inv), -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, lp["kernel_q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    row = (jnp.maximum(amax, 1e-20) * (1.0 / 127.0))
    y = y.astype(jnp.float32) * row * lp["scale"]
    return (y + lp["bias"]).astype(dtype)


def linear(lp: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Linear that dispatches on the param dict: fp kernel or int8."""
    if is_quantized(lp):
        return int8_linear(x, lp)
    return x @ lp["kernel"].astype(x.dtype) + lp["bias"].astype(x.dtype)


#: "xla" (default) = two int8 gemms + XLA-fused quant/dequant; "fused"
#: = the one-VMEM-pass Pallas kernel (kernels/int8_mlp.py). The
#: guarded round-5 re-measure (docs/measurements/ROUND5.md) puts the
#: fused kernel at 54.12 vs unfused 56.04 pairs/s (ViT-L 896x448 b8) —
#: a measured loss, not the pre-guard tie: XLA already fuses the
#: act-quant passes into the gemm epilogues, so the kernel stays an
#: opt-in like the fused decoder tail. "auto" = "fused" on TPU, "xla"
#: elsewhere.
MLP_IMPL = "xla"


def mlp(fc1: Params, fc2: Params, x: jnp.ndarray,
        gelu_approx: bool = False,
        kernel_mesh=None) -> jnp.ndarray:
    """Quantized transformer MLP: fused kernel on TPU, unfused on CPU.

    The fused kernel's GELU is tanh-only (no erf lowering in Mosaic);
    with ``gelu_approx=False`` (fp32-compute configs) it falls back to
    the unfused path so the exact flavor is preserved. kernel_mesh:
    (mesh, batch_axes) on a multi-device mesh (see
    parallel.mesh.shard_batch0_kernel).
    """
    impl = MLP_IMPL
    if impl == "auto":
        impl = "fused" if jax.default_backend() == "tpu" else "xla"
    if impl == "fused" and jax.default_backend() != "tpu":
        impl = "xla"  # no Mosaic off-TPU: --quant int8-fused degrades safely
    if impl == "fused" and gelu_approx:
        from painter_tpu.kernels.int8_mlp import int8_mlp
        from painter_tpu.parallel import mesh as mesh_lib

        def _kernel(x_, k1, s1, b1, k2, s2, b2):
            return int8_mlp(x_, {"kernel_q": k1, "scale": s1, "bias": b1},
                            {"kernel_q": k2, "scale": s2, "bias": b2})

        return mesh_lib.shard_batch0_kernel(
            _kernel, n_batch_args=1, n_rep_args=6,
            kernel_mesh=kernel_mesh)(
            x, fc1["kernel_q"], fc1["scale"], fc1["bias"],
            fc2["kernel_q"], fc2["scale"], fc2["bias"])
    h = linear(fc1, x)
    h = jax.nn.gelu(h, approximate=gelu_approx)
    return linear(fc2, h)
