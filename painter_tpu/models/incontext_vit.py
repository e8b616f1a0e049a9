"""The in-context ViT shared by Painter and SegGPT — functional JAX core.

One model family, two presets (see :mod:`painter_tpu.configs`): Painter and
SegGPT differ only in the SegGPT seg-type tokens, the feature-ensemble hooks,
and two loss details. Behavioral contract from
``Painter/models_painter.py:238-487`` and
``SegGPT/SegGPT_inference/models_seggpt.py:241-494``:

- two token streams x=patch_embed(imgs), y=patch_embed(tgts); masked y
  positions replaced by a learned mask token; per-stream segment tokens;
  shared bicubic-resized absolute pos-embed added to both (:385-406);
- streams concatenated on the batch axis for the first ``merge_idx+1``
  blocks, then averaged into one stream (:408-415);
- encoder taps: final-norm'ed features at blocks ``out_indices``
  (default {5,11,17,23}) feed the decoder (:416-418);
- decoder: channel-concat of 4 taps -> Linear(4C, p^2 * dec_dim) ->
  pixel-shuffle -> Conv3x3 -> LayerNorm2D -> GELU -> Conv1x1 -> 3
  (:326-333, :420-431);
- loss: masked smooth-L1 (beta=0.01) weighted by the per-pixel valid map
  (:433-462); Painter adds 1e-2 to the denominator and zeroes ``valid``
  for samples whose unmasked target is near-black; SegGPT does neither
  (models_seggpt.py:448-469);
- SegGPT feature ensemble: for blocks >= ``merge_between_batch``, the
  bottom-half (query) tokens are averaged across the prompt batch
  (models_seggpt.py:207-238, 425-429).

TPU-first design notes (not a translation):
- NHWC everywhere; params stored fp32; compute dtype configurable (bf16 on
  TPU); LayerNorm statistics and softmax in fp32.
- Blocks run under ``lax.scan`` over stacked (depth, ...) parameters,
  segmented at the static tap/ensemble boundaries, so the trunk traces one
  block body instead of 24 (fast compiles, remat-friendly).
- Relative-position tables are stored at the full-grid size for every
  block and interpolated on the fly (the same path that serves eval at a
  different resolution, ``vitdet_utils.py:63-93``). The released
  checkpoints are all-global so this is exact for them. Checkpoints
  *trained windowed* carry exact per-window (2*ws-1)-entry tables in the
  separate heterogeneous ``window_rel_pos_tables`` leaves (loaded by the
  converter, round-trip + fp64-oracle tested in
  tests/test_window_checkpoint.py), so no interpolation deviation
  remains on either block kind.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from painter_tpu.configs import IMAGENET_MEAN, IMAGENET_STD, ModelConfig
from painter_tpu.ops import quant
from painter_tpu.ops.attention import attention
from painter_tpu.ops.norm import layer_norm
from painter_tpu.ops.patches import patchify
from painter_tpu.ops.pos_embed import get_abs_pos
from painter_tpu.ops.windows import window_partition, window_unpartition

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(-b, b),
    # b = sqrt(6 / ((1 + 5) * fan_in)) = 1/sqrt(fan_in).
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_params(key: jax.Array, cfg: ModelConfig) -> Params:
    """Build the fp32 parameter pytree. Block params are stacked (depth,...)."""
    keys = iter(jax.random.split(key, 64))
    d = cfg.embed_dim
    p = cfg.patch_size
    hd = cfg.head_dim
    gh, gw = cfg.grid_size
    depth = cfg.depth
    mlp_dim = int(d * cfg.mlp_ratio)
    dec = cfg.decoder_embed_dim

    params: Params = {
        "patch_embed": {
            "kernel": _kaiming_uniform(next(keys), (p, p, cfg.in_chans, d),
                                       fan_in=cfg.in_chans * p * p),
            "bias": _kaiming_uniform(next(keys), (d,),
                                     fan_in=cfg.in_chans * p * p),
        },
        "mask_token": _trunc_normal(next(keys), (d,)),
        "segment_token_x": _trunc_normal(next(keys), (d,)),
        "segment_token_y": _trunc_normal(next(keys), (d,)),
        "norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "decoder_embed": {
            "kernel": _trunc_normal(next(keys), (4 * d, p * p * dec)),
            "bias": jnp.zeros((p * p * dec,)),
        },
        "decoder_pred": {
            "conv1": {
                "kernel": _kaiming_uniform(next(keys), (3, 3, dec, dec),
                                           fan_in=9 * dec),
                "bias": _kaiming_uniform(next(keys), (dec,), fan_in=9 * dec),
            },
            "ln": {"scale": jnp.ones((dec,)), "bias": jnp.zeros((dec,))},
            "conv2": {
                "kernel": _kaiming_uniform(next(keys), (1, 1, dec, 3),
                                           fan_in=dec),
                "bias": _kaiming_uniform(next(keys), (3,), fan_in=dec),
            },
        },
    }
    if cfg.use_abs_pos:
        n_pre = (cfg.pretrain_img_size // p) ** 2
        n_pos = n_pre + (1 if cfg.pretrain_use_cls_token else 0)
        params["pos_embed"] = _trunc_normal(next(keys), (n_pos, d))
    if cfg.seg_type_tokens:
        params["type_token_cls"] = _trunc_normal(next(keys), (d,))
        params["type_token_ins"] = _trunc_normal(next(keys), (d,))

    def stack_init(fn):
        return jnp.stack([fn(k) for k in jax.random.split(next(keys), depth)])

    blocks: Params = {
        "norm1": {"scale": jnp.ones((depth, d)), "bias": jnp.zeros((depth, d))},
        "norm2": {"scale": jnp.ones((depth, d)), "bias": jnp.zeros((depth, d))},
        "attn": {
            "qkv": {
                "kernel": stack_init(
                    lambda k: _trunc_normal(k, (d, 3 * d))),
                "bias": jnp.zeros((depth, 3 * d)),
            },
            "proj": {
                "kernel": stack_init(
                    lambda k: _trunc_normal(k, (d, d))),
                "bias": jnp.zeros((depth, d)),
            },
        },
        "mlp": {
            "fc1": {
                "kernel": stack_init(
                    lambda k: _trunc_normal(k, (d, mlp_dim))),
                "bias": jnp.zeros((depth, mlp_dim)),
            },
            "fc2": {
                "kernel": stack_init(
                    lambda k: _trunc_normal(k, (mlp_dim, d))),
                "bias": jnp.zeros((depth, d)),
            },
        },
    }
    if cfg.use_rel_pos:
        # Full-grid tables for every block (rel_pos_zero_init=True in the
        # reference factories -> zeros).
        blocks["attn"]["rel_pos_h"] = jnp.zeros((depth, 2 * gh - 1, hd))
        blocks["attn"]["rel_pos_w"] = jnp.zeros((depth, 2 * gw - 1, hd))
        if cfg.window_rel_pos_tables and cfg.window_block_indexes:
            # window-trained checkpoints: exact (2*ws-1)-entry tables for
            # the windowed blocks (see configs.window_rel_pos_tables);
            # global blocks' rows stay zero and are never read
            ws = cfg.window_size
            blocks["attn"]["rel_pos_h_win"] = jnp.zeros(
                (depth, 2 * ws - 1, hd))
            blocks["attn"]["rel_pos_w_win"] = jnp.zeros(
                (depth, 2 * ws - 1, hd))
    params["blocks"] = blocks

    if cfg.residual_block_indexes:
        # ResBottleneckBlock (models_painter.py:92-150): conv1x1 -> LN ->
        # GELU -> conv3x3 -> LN -> GELU -> conv1x1 -> zero-init LN,
        # residual added. Dead config in every reference factory
        # (residual_block_indexes=[]) but part of the model surface.
        # Params live per-index (unstackable: only some blocks have them).
        bott = d // 2

        def msra(k, shape, fan_out):
            # detectron2 c2_msra_fill: kaiming_normal fan_out relu
            std = np.sqrt(2.0 / fan_out)
            return std * jax.random.normal(k, shape)

        res = {}
        for i in cfg.residual_block_indexes:
            k1, k2, k3 = jax.random.split(next(keys), 3)
            res[str(i)] = {
                "conv1": {"kernel": msra(k1, (1, 1, d, bott), bott)},
                "norm1": {"scale": jnp.ones((bott,)),
                          "bias": jnp.zeros((bott,))},
                "conv2": {"kernel": msra(k2, (3, 3, bott, bott),
                                         9 * bott)},
                "norm2": {"scale": jnp.ones((bott,)),
                          "bias": jnp.zeros((bott,))},
                "conv3": {"kernel": msra(k3, (1, 1, bott, d), d)},
                "norm3": {"scale": jnp.zeros((d,)),
                          "bias": jnp.zeros((d,))},
            }
        params["residual_blocks"] = res
    return params


def _slice_block(blocks: Params, i) -> Params:
    return jax.tree_util.tree_map(lambda a: a[i], blocks)


# ---------------------------------------------------------------------------
# Block
# ---------------------------------------------------------------------------

def _mlp(bp: Params, x: jnp.ndarray, gelu_approx: bool = False,
         kernel_mesh=None) -> jnp.ndarray:
    # int8 serving pytrees (ops.quant.quantize_params) take the fused
    # w8a8 kernel path on TPU (kernels/int8_mlp.py); fp params keep the
    # XLA gemms + the remat checkpoint name below
    if quant.is_quantized(bp["fc1"]):
        return quant.mlp(bp["fc1"], bp["fc2"], x, gelu_approx=gelu_approx,
                         kernel_mesh=kernel_mesh)
    x = quant.linear(bp["fc1"], x)
    # named checkpoint: the 'save_attn_mlp' remat policy keeps this
    # pre-activation so the backward recompute is gemm-free (fc2's input
    # is re-gelu'd from it; fc1's own gemm is never needed in backward)
    x = checkpoint_name(x, "mlp_fc1")
    x = jax.nn.gelu(x, approximate=gelu_approx)
    x = quant.linear(bp["fc2"], x)
    return x


def _drop_path(x: jnp.ndarray, rate, key: Optional[jax.Array],
               train: bool) -> jnp.ndarray:
    """Per-sample stochastic depth (timm DropPath semantics)."""
    if not train or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / jnp.asarray(keep, x.dtype)


def _feature_ensemble(x: jnp.ndarray, groups: int,
                      weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SegGPT multi-prompt ensemble (models_seggpt.py:221-230).

    Splits the token grid along height into (prompt-half, query-half) and
    replaces the query-half with its mean over the prompt batch. Before the
    stream merge the batch holds the x- and y-streams stacked (groups=2);
    after it groups=1.

    ``weights`` (per-prompt, shape (n,), summing to 1) generalizes the mean
    to a weighted sum so one compiled shape can serve any real prompt count
    <= n: padded prompt samples get weight 0 and drop out of the pooled
    query half exactly (the padded samples' own query halves are then
    overwritten with the pooled value, and only sample 0 is ever read).
    """
    hp = x.shape[1] // 2
    prompt, inputs = x[:, :hp], x[:, hp:]
    b = x.shape[0]
    n = b // groups
    grouped = inputs.reshape(groups, n, *inputs.shape[1:])
    if weights is None:
        pooled = grouped.mean(axis=1, keepdims=True)
    else:
        w = weights.astype(inputs.dtype).reshape(
            (1, n) + (1,) * (inputs.ndim - 1))
        pooled = (grouped * w).sum(axis=1, keepdims=True)
    inputs = jnp.broadcast_to(
        pooled, (groups, n) + inputs.shape[1:]).reshape(inputs.shape)
    return jnp.concatenate([prompt, inputs], axis=1)


def residual_bottleneck_apply(rp: Params, x: jnp.ndarray,
                              eps: float = 1e-5) -> jnp.ndarray:
    """ResBottleneckBlock over (B, H, W, C) (models_painter.py:144-150).

    detectron2 get_norm("LN", ch) is channel-wise LayerNorm (eps 1e-5
    default wrapped by LayerNorm2D semantics -> last axis here)."""
    dtype = x.dtype

    def conv(h, kernel):
        return jax.lax.conv_general_dilated(
            h, kernel.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    out = conv(x, rp["conv1"]["kernel"])
    out = layer_norm(out, rp["norm1"]["scale"], rp["norm1"]["bias"], eps)
    out = jax.nn.gelu(out, approximate=False)
    out = conv(out, rp["conv2"]["kernel"])
    out = layer_norm(out, rp["norm2"]["scale"], rp["norm2"]["bias"], eps)
    out = jax.nn.gelu(out, approximate=False)
    out = conv(out, rp["conv3"]["kernel"])
    out = layer_norm(out, rp["norm3"]["scale"], rp["norm3"]["bias"], eps)
    return x + out


def block_apply(bp: Params, x: jnp.ndarray, cfg: ModelConfig, *,
                window_size: int = 0, dpr=0.0,
                ensemble_groups: int = 0,
                ensemble_weights: Optional[jnp.ndarray] = None,
                train: bool = False, rng: Optional[jax.Array] = None,
                attn_impl: str = "xla", kernel_mesh=None) -> jnp.ndarray:
    """One transformer block over an (B, H, W, C) grid."""
    b, h, w, _ = x.shape
    shortcut = x
    xn = layer_norm(x, bp["norm1"]["scale"], bp["norm1"]["bias"], cfg.ln_eps)

    if window_size > 0:
        xn, pad_hw = window_partition(xn, window_size)
        hw = (window_size, window_size)
    else:
        hw = (h, w)
    rel = None
    if cfg.use_rel_pos:
        if window_size > 0 and "rel_pos_h_win" in bp["attn"]:
            # window-trained checkpoint tables: exact at the window size
            rel = (bp["attn"]["rel_pos_h_win"], bp["attn"]["rel_pos_w_win"])
        else:
            rel = (bp["attn"]["rel_pos_h"], bp["attn"]["rel_pos_w"])
    att = attention(xn, bp["attn"], cfg.num_heads, hw, rel_pos=rel,
                    impl=attn_impl, kernel_mesh=kernel_mesh)
    if window_size > 0:
        att = window_unpartition(att, window_size, pad_hw, (h, w))
    # named checkpoint: the 'save_attn' remat policy keeps this tensor so
    # the backward's recompute skips the whole attention op (the VPU-bound
    # softmax kernel) and re-runs only LN + gemms + MLP
    att = checkpoint_name(att, "attn_out")

    if ensemble_groups:
        att = _feature_ensemble(att, ensemble_groups, ensemble_weights)

    k1 = k2 = None
    if train and rng is not None:
        k1, k2 = jax.random.split(rng)
    x = shortcut + _drop_path(att, dpr, k1, train)
    xm = _mlp(bp["mlp"], layer_norm(x, bp["norm2"]["scale"],
                                    bp["norm2"]["bias"], cfg.ln_eps),
              gelu_approx=cfg.gelu_approximate, kernel_mesh=kernel_mesh)
    x = x + _drop_path(xm, dpr, k2, train)
    return x


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _dpr_schedule(cfg: ModelConfig) -> np.ndarray:
    return np.linspace(0.0, cfg.drop_path_rate, cfg.depth)


def _block_plan(cfg: ModelConfig, merge_between_batch: int):
    """Static per-block (window_size, ensemble_groups, boundary?) plan.

    The third entry marks segment boundaries: feature taps and residual
    bottleneck blocks both end a scan segment."""
    plan = []
    for i in range(cfg.depth):
        ws = cfg.window_size if i in cfg.window_block_indexes else 0
        groups = 0
        if merge_between_batch >= 0 and i >= merge_between_batch:
            # merge=1 (two stream-groups) up to and incl. the stream-merge
            # block, merge=2 (one group) after (models_seggpt.py:425-429).
            groups = 2 if cfg.merge_idx >= i else 1
        boundary = (i in cfg.out_indices
                    or i in cfg.residual_block_indexes)
        plan.append((ws, groups, boundary))
    return plan


def forward_encoder(params: Params, cfg: ModelConfig, imgs: jnp.ndarray,
                    tgts: jnp.ndarray, bool_masked_pos: jnp.ndarray,
                    seg_type: Optional[jnp.ndarray] = None,
                    merge_between_batch: int = -1, train: bool = False,
                    rng: Optional[jax.Array] = None,
                    attn_impl: str = "xla",
                    remat: bool = False,
                    remat_policy: Optional[str] = None,
                    act_constraint=None,
                    ensemble_weights: Optional[jnp.ndarray] = None,
                    kernel_mesh=None,
                    ) -> List[jnp.ndarray]:
    """imgs/tgts (B, H, W, 3) NHWC -> list of tapped features (B,Hp,Wp,C).

    kernel_mesh: (mesh, batch_axes) when tracing for a multi-device
    mesh — Pallas kernel sites shard_map themselves over the batch
    shards (parallel.mesh.shard_batch0_kernel).
    """
    dtype = cfg.compute_dtype
    kernel = params["patch_embed"]["kernel"].astype(dtype)
    bias = params["patch_embed"]["bias"].astype(dtype)

    def embed(im):
        y = jax.lax.conv_general_dilated(
            im.astype(dtype), kernel,
            window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias

    x = embed(imgs)
    y = embed(tgts)
    b, hp, wp, _ = x.shape

    m = bool_masked_pos.astype(dtype).reshape(b, hp, wp, 1)
    y = y * (1.0 - m) + params["mask_token"].astype(dtype) * m

    x = x + params["segment_token_x"].astype(dtype)
    y = y + params["segment_token_y"].astype(dtype)
    if cfg.use_abs_pos:
        pos = get_abs_pos(params["pos_embed"], cfg.pretrain_use_cls_token,
                          (hp, wp)).astype(dtype)
        x = x + pos
        y = y + pos

    if cfg.seg_type_tokens:
        if seg_type is None:
            seg_type = jnp.zeros((b, 1), jnp.int32)
        st = seg_type.reshape(b).astype(jnp.int32)
        type_emb = jnp.where(
            (st == 1)[:, None],
            params["type_token_ins"].astype(dtype)[None],
            params["type_token_cls"].astype(dtype)[None])[:, None, None, :]
        x = x + type_emb
        y = y + type_emb

    x = jnp.concatenate([x, y], axis=0)
    # keep activations batch-sharded through the trunk so SPMD never
    # round-trips them through a different layout (the involuntary-
    # rematerialization warning on dp+fsdp meshes)
    if act_constraint is not None:
        x = act_constraint(x)

    dpr = _dpr_schedule(cfg)
    plan = _block_plan(cfg, merge_between_batch)
    blocks = params["blocks"]

    def make_block(ws: int, groups: int):
        # "auto" = measured per-shape dispatch (ROUND5.md, v5e
        # 2026-08-19): the pallas kernel wins every measured FORWARD
        # shape (L=196 window tile 2.12 vs XLA 2.51 ms/app; L=1568
        # global 3.17 vs ~2x), but at the window tile XLA wins fwd+bwd
        # (5.98 vs 7.70 ms/app — one ragged 200-row grid step can't
        # hide the dK/dV accumulator traffic), so TRAINING a windowed
        # segment routes to XLA while everything else keeps the kernel.
        seg_impl = attn_impl
        if seg_impl == "auto":
            seg_impl = "xla" if (ws > 0 and train) else "pallas"

        def fn(bp, h, rate, key):
            return block_apply(bp, h, cfg, window_size=ws, dpr=rate,
                               ensemble_groups=groups,
                               ensemble_weights=ensemble_weights,
                               train=train, rng=key, attn_impl=seg_impl,
                               kernel_mesh=kernel_mesh)
        if not remat:
            return fn
        if remat_policy == "save_attn":
            # keep each block's post-proj attention output (+25 MB/block
            # at ViT-L b8). Round-4 correction: this does NOT skip the
            # attention-kernel recompute — the kernel's custom-vjp
            # residuals (out, lse) still had to be regenerated, which is
            # why this policy measured equal to full remat (713.7 vs
            # 714.4 ms). Kept for comparison; prefer "save_kernel".
            policy = jax.checkpoint_policies.save_only_these_names(
                "attn_out")
            return jax.checkpoint(fn, policy=policy)
        # The 'save_kernel*' policies name tensors that only exist
        # inside the pallas kernel (flash_relpos._flash_core). Under
        # attn_impl='xla' those names match nothing and the policy
        # silently degrades to FULL remat — strictly worse than
        # 'save_attn', which for the xla path genuinely skips the
        # attention recompute. Resolve them to the xla-path equivalent
        # ('attn_out', the post-proj named checkpoint) instead.
        kernel_names = ("attn_kernel_out", "attn_lse") \
            if seg_impl == "pallas" else ("attn_out",)
        if remat_policy == "save_kernel":
            # keep the flash kernel's own outputs (out 25 MB + lse
            # 0.8 MB per block at ViT-L b8): the kernel forward is named
            # via checkpoint_name inside flash_relpos._flash_core, so
            # the backward recompute drops the pallas fwd call entirely
            # and re-runs only LN/gemms/MLP — same HBM cost as
            # "save_attn" but actually skips the 2.3 ms/block kernel
            policy = jax.checkpoint_policies.save_only_these_names(
                *kernel_names)
            return jax.checkpoint(fn, policy=policy)
        if remat_policy == "save_kernel_attn":
            # save_kernel + the post-proj output (prunes one proj gemm
            # from the recompute for +25 MB/block more HBM traffic)
            policy = jax.checkpoint_policies.save_only_these_names(
                *kernel_names, "attn_out")
            return jax.checkpoint(fn, policy=policy)
        if remat_policy == "save_kernel_mlp":
            # save_kernel + the fc1 pre-activation (gemm-free MLP
            # recompute at +100 MB/block HBM traffic)
            policy = jax.checkpoint_policies.save_only_these_names(
                *kernel_names, "mlp_fc1")
            return jax.checkpoint(fn, policy=policy)
        if remat_policy == "save_attn_mlp":
            # also keep the fc1 pre-activation (+100 MB/block at ViT-L
            # b8 bf16): the recompute then re-runs no gemm at all — only
            # LN2 + gelu (round-3 remat-frontier sweep)
            policy = jax.checkpoint_policies.save_only_these_names(
                "attn_out", "mlp_fc1")
            return jax.checkpoint(fn, policy=policy)
        if remat_policy == "save_dots":
            # classic frontier point: keep every non-batch matmul output
            policy = jax.checkpoint_policies \
                .dots_with_no_batch_dims_saveable
            return jax.checkpoint(fn, policy=policy)
        if remat_policy is not None:
            raise ValueError(f"unknown remat_policy {remat_policy!r}")
        return jax.checkpoint(fn)

    def step_rng(i):
        return None if rng is None else jax.random.fold_in(rng, i)

    for t in cfg.out_indices:
        assert t >= cfg.merge_idx, (
            "taps before the stream merge would mix batch sizes")

    taps: List[jnp.ndarray] = []

    def maybe_residual(x, i):
        if i in cfg.residual_block_indexes:
            x = residual_bottleneck_apply(
                params["residual_blocks"][str(i)], x)
        return x

    # --- prefix: idx 0..merge_idx, double-batch, unrolled (3 blocks) ---
    i = 0
    while i <= cfg.merge_idx:
        ws, groups, _ = plan[i]
        x = make_block(ws, groups)(_slice_block(blocks, i), x, dpr[i],
                                   step_rng(i))
        x = maybe_residual(x, i)
        if i == cfg.merge_idx:
            half = x.shape[0] // 2
            x = (x[:half] + x[half:]) * 0.5
            if act_constraint is not None:
                x = act_constraint(x)
        if i in cfg.out_indices:
            taps.append(x)
        i += 1

    # --- trunk: scan segments between static boundaries ---
    # A segment is a maximal run of blocks with identical (window, groups)
    # static plan and no interior tap, so one traced body serves the run.
    while i < cfg.depth:
        j = i
        while (j + 1 < cfg.depth and plan[j + 1][:2] == plan[i][:2]
               and not plan[j][2]):
            j += 1
        seg = list(range(i, j + 1))
        ws, groups, _ = plan[i]
        block_fn = make_block(ws, groups)
        if len(seg) == 1:
            x = block_fn(_slice_block(blocks, i), x, dpr[i], step_rng(i))
        else:
            seg_params = jax.tree_util.tree_map(
                lambda a: a[seg[0]:seg[-1] + 1], blocks)
            seg_dpr = jnp.asarray(dpr[seg[0]:seg[-1] + 1], jnp.float32)
            if rng is not None:
                seg_keys = jax.vmap(
                    lambda s: jax.random.fold_in(rng, s))(
                        jnp.asarray(seg, jnp.uint32))
                xs = (seg_params, seg_dpr, seg_keys)
                body = lambda c, inp: (block_fn(inp[0], c, inp[1], inp[2]),
                                       None)
            else:
                xs = (seg_params, seg_dpr)
                body = lambda c, inp: (block_fn(inp[0], c, inp[1], None),
                                       None)
            x, _ = jax.lax.scan(body, x, xs)
        x = maybe_residual(x, seg[-1])
        for s in seg:
            if s in cfg.out_indices:
                taps.append(x)
        i = j + 1

    norm_s = params["norm"]["scale"]
    norm_b = params["norm"]["bias"]
    return [layer_norm(t, norm_s, norm_b, cfg.ln_eps) for t in taps]


# ---------------------------------------------------------------------------
# Decoder, loss, full forward
# ---------------------------------------------------------------------------

def forward_decoder(params: Params, cfg: ModelConfig,
                    feats: Sequence[jnp.ndarray],
                    decoder_impl: str = "xla") -> jnp.ndarray:
    """4 tapped features -> painted prediction (B, H, W, 3).

    decoder_impl "fused" runs the post-shuffle tail (conv3x3, LN, GELU,
    conv1x1) in one Pallas kernel
    (:mod:`painter_tpu.kernels.decoder_head`) — the full-decode
    training path's measured hot spot; "xla" is the plain lowering;
    "packed" runs the tail with W-pixel pairs packed into the channel
    dim (see :func:`_decoder_tail_packed`).
    """
    x = jnp.concatenate(list(feats), axis=-1)  # (B, Hp, Wp, 4C)
    dtype = x.dtype
    x = quant.linear(params["decoder_embed"], x)
    b, h, w, _ = x.shape
    p = cfg.patch_size
    dec = cfg.decoder_embed_dim
    dp = params["decoder_pred"]
    if decoder_impl == "packed":
        if (w * p) % 2:
            raise ValueError(
                f"decoder_impl='packed' pairs adjacent W pixels and needs "
                f"an even painted width; got w*p = {w}*{p} = {w * p} — "
                f"use decoder_impl='xla' for odd widths")
        # shuffle straight into the packed layout: same 6D transpose,
        # the last two pixels of each W-pair land in one 128-lane row
        x = x.reshape(b, h, w, p, p, dec)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h * p, (w * p) // 2, 2 * dec)
        return _decoder_tail_packed(x, dp, cfg)
    # pixel shuffle: (B, h, w, p*p*dec) -> (B, h*p, w*p, dec)
    x = x.reshape(b, h, w, p, p, dec)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * p, w * p, dec)
    if decoder_impl == "fused":
        from painter_tpu.kernels.decoder_head import fused_decoder_tail
        return fused_decoder_tail(
            x, dp["conv1"]["kernel"], dp["conv1"]["bias"],
            dp["ln"]["scale"], dp["ln"]["bias"], dp["conv2"]["kernel"],
            dp["conv2"]["bias"], cfg.gelu_approximate)
    if decoder_impl != "xla":
        raise ValueError(decoder_impl)

    x = jax.lax.conv_general_dilated(
        x, dp["conv1"]["kernel"].astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + dp["conv1"]["bias"].astype(dtype)
    x = layer_norm(x, dp["ln"]["scale"], dp["ln"]["bias"], eps=1e-6)
    x = jax.nn.gelu(x, approximate=cfg.gelu_approximate)
    x = jax.lax.conv_general_dilated(
        x, dp["conv2"]["kernel"].astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + dp["conv2"]["bias"].astype(dtype)
    return x


def _decoder_tail_packed(x: jnp.ndarray, dp: Params,
                         cfg: ModelConfig) -> jnp.ndarray:
    """Decoder tail on W-pixel pairs packed into channels (training A/B).

    Motivation (backward component profile, BASELINE.md): the xla tail
    at C=64 lane-pads every (B, 896, 448, 64) activation 2× (784 MB
    temps for 392 MB of payload) and its convs produce 64-lane outputs
    (50% MXU). Packing two adjacent W pixels into one 128-lane channel
    row removes the padding; the conv3x3 becomes a block-structured
    (3, 3, 2*dec, 2*dec) conv over half the width — 2× the nominal
    FLOPs at full lane utilization. Math identical to the xla path
    (same ops, same fp types); grads flow to the canonical
    (3,3,dec,dec) weights through the packed-kernel construction.

    MEASURED-AND-REJECTED as the training default (2026-08-19, B=8
    ViT-L save_kernel train step on v5e): 672.5 vs 646.0 ms/step — the
    doubled conv FLOPs are not hidden; XLA's C=64 conv lowering is
    better than its 2×-padded temps implied. Kept opt-in
    (``decoder_impl="packed"``), parity-tested in
    tests/test_decoder_head.py.
    """
    dtype = x.dtype
    b, hh, wp2, cc = x.shape
    dec = cc // 2
    w1 = dp["conv1"]["kernel"].astype(dtype)  # (3, 3, dec, dec)
    # packed conv kernel: output pixel t of a pair reads input pixel
    # t + dw (dw = kw - 1); that pixel lives in packed column offset
    # floor((t+dw)/2) at slot (t+dw) % 2
    wp = jnp.zeros((3, 3, 2 * dec, 2 * dec), dtype)
    for t in (0, 1):
        for dw in (-1, 0, 1):
            pix = t + dw
            kwp, u = pix // 2, pix % 2
            wp = wp.at[:, kwp + 1, u * dec:(u + 1) * dec,
                       t * dec:(t + 1) * dec].set(w1[:, dw + 1])
    x = jax.lax.conv_general_dilated(
        x, wp, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) \
        + jnp.tile(dp["conv1"]["bias"].astype(dtype), 2)
    # LN normalizes each pixel's own 64 channels: reshape the packed
    # pair apart for the (fp32) stats, back together for the rest
    x = layer_norm(x.reshape(b, hh, wp2, 2, dec), dp["ln"]["scale"],
                   dp["ln"]["bias"], eps=1e-6).reshape(b, hh, wp2, cc)
    x = jax.nn.gelu(x, approximate=cfg.gelu_approximate)
    w2 = dp["conv2"]["kernel"].astype(dtype)[0, 0]  # (dec, 3)
    w2p = jnp.zeros((2 * dec, 6), dtype)
    w2p = w2p.at[:dec, :3].set(w2).at[dec:, 3:].set(w2)
    x = x @ w2p + jnp.tile(dp["conv2"]["bias"].astype(dtype), 2)
    return x.reshape(b, hh, wp2 * 2, 3)


def pixel_mask_from_patch_mask(bool_masked_pos: jnp.ndarray,
                               cfg: ModelConfig,
                               hw: Tuple[int, int]) -> jnp.ndarray:
    """(B, L) patch mask -> (B, H, W, 1) per-pixel mask."""
    b = bool_masked_pos.shape[0]
    gh, gw = hw[0] // cfg.patch_size, hw[1] // cfg.patch_size
    m = bool_masked_pos.reshape(b, gh, gw).astype(jnp.float32)
    m = jnp.repeat(jnp.repeat(m, cfg.patch_size, axis=1),
                   cfg.patch_size, axis=2)
    return m[..., None]


def forward_loss(cfg: ModelConfig, pred: jnp.ndarray, tgts: jnp.ndarray,
                 bool_masked_pos: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
    """Masked, valid-weighted regression loss (models_painter.py:433-462)."""
    pred = pred.astype(jnp.float32)
    tgts = tgts.astype(jnp.float32)
    valid = valid.astype(jnp.float32)
    mask = pixel_mask_from_patch_mask(bool_masked_pos, cfg, tgts.shape[1:3])

    if cfg.near_black_check:
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        denorm = tgts * std + mean
        unmasked_sum = (denorm * (1.0 - mask)).sum(axis=(1, 2, 3))
        ignore = unmasked_sum < 100.0 * 3
        valid = jnp.where(ignore[:, None, None, None], 0.0, valid)

    mask = mask * valid

    diff = pred - tgts
    if cfg.loss_func == "l1l2":
        loss = (jnp.abs(diff) + diff ** 2) * 0.5
    elif cfg.loss_func == "l1":
        loss = jnp.abs(diff)
    elif cfg.loss_func == "l2":
        loss = diff ** 2
    elif cfg.loss_func == "smoothl1":
        beta = 0.01
        loss = jnp.where(jnp.abs(diff) < beta,
                         0.5 * diff ** 2 / beta,
                         jnp.abs(diff) - 0.5 * beta)
    else:
        raise ValueError(cfg.loss_func)
    return (loss * mask).sum() / (mask.sum() + cfg.loss_denom_eps)


def forward(params: Params, cfg: ModelConfig, imgs: jnp.ndarray,
            tgts: jnp.ndarray, bool_masked_pos: Optional[jnp.ndarray] = None,
            valid: Optional[jnp.ndarray] = None,
            seg_type: Optional[jnp.ndarray] = None,
            merge_between_batch: int = -1, train: bool = False,
            rng: Optional[jax.Array] = None, attn_impl: str = "xla",
            remat: bool = False, remat_policy: Optional[str] = None,
            act_constraint=None, decoder_impl: str = "xla",
            kernel_mesh=None):
    """Full forward. Returns (loss, patchified pred, bool_masked_pos),

    mirroring ``models_painter.py:464-472`` (NHWC in/out)."""
    b = imgs.shape[0]
    num_patches = (imgs.shape[1] // cfg.patch_size) * \
                  (imgs.shape[2] // cfg.patch_size)
    if bool_masked_pos is None:
        bool_masked_pos = jnp.zeros((b, num_patches), jnp.float32)
    else:
        bool_masked_pos = bool_masked_pos.reshape(b, -1)
    if valid is None:
        valid = jnp.ones_like(tgts)
    feats = forward_encoder(params, cfg, imgs, tgts, bool_masked_pos,
                            seg_type=seg_type,
                            merge_between_batch=merge_between_batch,
                            train=train, rng=rng, attn_impl=attn_impl,
                            remat=remat, remat_policy=remat_policy,
                            act_constraint=act_constraint,
                            kernel_mesh=kernel_mesh)
    pred = forward_decoder(params, cfg, feats, decoder_impl=decoder_impl)
    loss = forward_loss(cfg, pred, tgts, bool_masked_pos, valid)
    return loss, patchify(pred.astype(jnp.float32), cfg.patch_size), \
        bool_masked_pos


def predict_image(params: Params, cfg: ModelConfig, imgs: jnp.ndarray,
                  tgts: jnp.ndarray, bool_masked_pos: jnp.ndarray,
                  seg_type: Optional[jnp.ndarray] = None,
                  merge_between_batch: int = -1,
                  attn_impl: str = "xla", kernel_mesh=None) -> jnp.ndarray:
    """Inference-only path -> painted prediction (B, H, W, 3), no loss."""
    feats = forward_encoder(params, cfg, imgs, tgts,
                            bool_masked_pos.reshape(imgs.shape[0], -1),
                            seg_type=seg_type,
                            merge_between_batch=merge_between_batch,
                            train=False, attn_impl=attn_impl,
                            kernel_mesh=kernel_mesh)
    return forward_decoder(params, cfg, feats).astype(jnp.float32)


def predict_query_half(params: Params, cfg: ModelConfig, imgs: jnp.ndarray,
                       tgts: jnp.ndarray, bool_masked_pos: jnp.ndarray,
                       seg_type: Optional[jnp.ndarray] = None,
                       merge_between_batch: int = -1,
                       attn_impl: str = "xla",
                       ensemble_weights: Optional[jnp.ndarray] = None,
                       kernel_mesh=None,
                       ) -> jnp.ndarray:
    """In-context inference fast path -> (H/2, W, 3) painted query half.

    The engines only ever read the bottom (query) half of sample 0
    (``seggpt_engine.py:51``; multi-prompt ensembling makes all samples'
    query halves identical, models_seggpt.py:221-230). Decoding only
    those tokens — plus one extra token row so the decoder's 3x3 conv
    sees its real 16-pixel context across the seam, cropped after — is
    bitwise-equivalent to slicing the full decode, and cuts decoder
    FLOPs by 2 x num_prompts.
    """
    feats = forward_encoder(params, cfg, imgs, tgts,
                            bool_masked_pos.reshape(imgs.shape[0], -1),
                            seg_type=seg_type,
                            merge_between_batch=merge_between_batch,
                            train=False, attn_impl=attn_impl,
                            ensemble_weights=ensemble_weights,
                            kernel_mesh=kernel_mesh)
    gh = feats[0].shape[1]
    half = gh // 2
    sliced = [f[:1, half - 1:] for f in feats]
    pred = forward_decoder(params, cfg, sliced)
    return pred[0, cfg.patch_size:].astype(jnp.float32)


def predict_query_half_batch(params: Params, cfg: ModelConfig,
                             imgs: jnp.ndarray, tgts: jnp.ndarray,
                             bool_masked_pos: jnp.ndarray,
                             seg_type: Optional[jnp.ndarray] = None,
                             attn_impl: str = "xla",
                             kernel_mesh=None) -> jnp.ndarray:
    """Batched independent queries -> (B, H/2, W, 3) painted halves.

    The serving/eval throughput path: every sample is its own
    (prompt, query) pair (no cross-sample ensemble — the batched
    analogue of the reference's per-image ``painter_inference_*``
    loops), and *all* bottom halves are decoded with the same
    one-extra-token-row seam trick as :func:`predict_query_half`.
    """
    feats = forward_encoder(params, cfg, imgs, tgts,
                            bool_masked_pos.reshape(imgs.shape[0], -1),
                            seg_type=seg_type, merge_between_batch=-1,
                            train=False, attn_impl=attn_impl,
                            kernel_mesh=kernel_mesh)
    gh = feats[0].shape[1]
    half = gh // 2
    sliced = [f[:, half - 1:] for f in feats]
    pred = forward_decoder(params, cfg, sliced)
    return pred[:, cfg.patch_size:].astype(jnp.float32)
