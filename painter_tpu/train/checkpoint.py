"""Checkpointing: torch-.pth converter + Orbax sharded train-state store.

Replaces the reference's checkpoint kit (``Painter/util/misc.py:296-378``):
- rank-0 ``torch.save``/``load`` -> Orbax CheckpointManager (sharded,
  async-capable, step-granular);
- ``--auto_resume`` newest-``checkpoint-*.pth`` glob -> Orbax
  ``latest_step()``;
- MAE-init surgery (``main_train.py:199-224``: delete shape-mismatched
  decoder/mask-token keys, then ``load_state_dict(strict=False)``) ->
  :func:`load_torch_params` merging converted tensors over an init tree;
- inference ``strict=False`` load (``seggpt_inference.py:46``) -> same.

The torch converter is one-way-tested both ways: convert_torch_state_dict
and params_to_torch_state_dict round-trip in tests.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import numpy as np

from painter_tpu.configs import ModelConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# torch <-> pytree conversion
# ---------------------------------------------------------------------------

def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def convert_torch_state_dict(sd: Dict[str, Any],
                             cfg: ModelConfig) -> Params:
    """torch state_dict (reference naming) -> our stacked param pytree.

    Unknown keys are ignored (strict=False semantics); returns only what
    was present. Block params come back stacked (depth, ...).
    """
    sd = {k: _to_np(v) for k, v in sd.items()}
    out: Params = {}

    def put(path, value):
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    if "patch_embed.proj.weight" in sd:
        put(("patch_embed", "kernel"),
            sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
        put(("patch_embed", "bias"), sd["patch_embed.proj.bias"])
    for tok in ("mask_token", "segment_token_x", "segment_token_y",
                "type_token_cls", "type_token_ins"):
        if tok in sd:
            put((tok,), sd[tok].reshape(-1))
    if "pos_embed" in sd:
        put(("pos_embed",), sd["pos_embed"].reshape(
            sd["pos_embed"].shape[-2], sd["pos_embed"].shape[-1]))
    if "norm.weight" in sd:
        put(("norm", "scale"), sd["norm.weight"])
        put(("norm", "bias"), sd["norm.bias"])
    if "decoder_embed.weight" in sd:
        put(("decoder_embed", "kernel"), sd["decoder_embed.weight"].T)
        put(("decoder_embed", "bias"), sd["decoder_embed.bias"])
    if "decoder_pred.0.weight" in sd:
        put(("decoder_pred", "conv1", "kernel"),
            sd["decoder_pred.0.weight"].transpose(2, 3, 1, 0))
        put(("decoder_pred", "conv1", "bias"), sd["decoder_pred.0.bias"])
        put(("decoder_pred", "ln", "scale"), sd["decoder_pred.1.weight"])
        put(("decoder_pred", "ln", "bias"), sd["decoder_pred.1.bias"])
        put(("decoder_pred", "conv2", "kernel"),
            sd["decoder_pred.3.weight"].transpose(2, 3, 1, 0))
        put(("decoder_pred", "conv2", "bias"), sd["decoder_pred.3.bias"])

    # blocks.{i}.<name> -> stacked
    block_re = re.compile(r"^blocks\.(\d+)\.(.+)$")
    per_block: Dict[str, Dict[int, np.ndarray]] = {}
    for k, v in sd.items():
        mt = block_re.match(k)
        if mt:
            per_block.setdefault(mt.group(2), {})[int(mt.group(1))] = v

    def stack(name, transform=lambda a: a):
        vals = per_block.get(name)
        if vals is None:
            return None
        assert sorted(vals) == list(range(cfg.depth)), (
            name, sorted(vals), cfg.depth)
        return np.stack([transform(vals[i]) for i in range(cfg.depth)])

    mapping = {
        ("blocks", "norm1", "scale"): ("norm1.weight", None),
        ("blocks", "norm1", "bias"): ("norm1.bias", None),
        ("blocks", "norm2", "scale"): ("norm2.weight", None),
        ("blocks", "norm2", "bias"): ("norm2.bias", None),
        ("blocks", "attn", "qkv", "kernel"): ("attn.qkv.weight", "T"),
        ("blocks", "attn", "qkv", "bias"): ("attn.qkv.bias", None),
        ("blocks", "attn", "proj", "kernel"): ("attn.proj.weight", "T"),
        ("blocks", "attn", "proj", "bias"): ("attn.proj.bias", None),
        ("blocks", "mlp", "fc1", "kernel"): ("mlp.fc1.weight", "T"),
        ("blocks", "mlp", "fc1", "bias"): ("mlp.fc1.bias", None),
        ("blocks", "mlp", "fc2", "kernel"): ("mlp.fc2.weight", "T"),
        ("blocks", "mlp", "fc2", "bias"): ("mlp.fc2.bias", None),
    }
    for path, (tname, tf) in mapping.items():
        arr = stack(tname, (lambda a: a.T) if tf == "T" else (lambda a: a))
        if arr is not None:
            put(path, arr)

    # Rel-pos tables: a window-trained checkpoint sizes each block's
    # tables by its own attention extent (models_painter.py:309 — window
    # blocks get (2*window_size-1, hd), global blocks the full grid), so
    # the per-block shapes can be HETEROGENEOUS. Route window-sized rows
    # into the rel_pos_{h,w}_win stacked leaves (read exactly, never
    # interpolated — configs.window_rel_pos_tables) and everything else
    # into the full-grid leaves; absent rows stay zero and are never
    # read by the forward.
    for axis in ("h", "w"):
        vals = per_block.get(f"attn.rel_pos_{axis}")
        if vals is None:
            continue
        shapes = {v.shape for v in vals.values()}
        if len(shapes) == 1:
            put(("blocks", "attn", f"rel_pos_{axis}"),
                np.stack([vals[i] for i in range(cfg.depth)]))
            continue
        win_len = 2 * cfg.window_size - 1
        hd = next(iter(vals.values())).shape[-1]
        full_len = max(v.shape[0] for v in vals.values())
        assert full_len != win_len, (
            "cannot disambiguate window vs global rel-pos tables: "
            f"both are length {win_len}")
        full = np.zeros((cfg.depth, full_len, hd), np.float32)
        win = np.zeros((cfg.depth, win_len, hd), np.float32)
        for i, v in vals.items():
            if v.shape[0] == win_len:
                win[i] = v
            else:
                assert v.shape[0] == full_len, (
                    f"block {i} rel_pos_{axis} has unexpected length "
                    f"{v.shape[0]} (window {win_len}, global {full_len})")
                full[i] = v
        put(("blocks", "attn", f"rel_pos_{axis}"), full)
        put(("blocks", "attn", f"rel_pos_{axis}_win"), win)

    # per-index ResBottleneckBlock params (blocks.{i}.residual.*)
    for name, vals in per_block.items():
        if not name.startswith("residual."):
            continue
        sub = name[len("residual."):]
        for i, v in vals.items():
            if sub.endswith("conv1.weight"):
                put(("residual_blocks", str(i), "conv1", "kernel"),
                    v.transpose(2, 3, 1, 0))
            elif sub.endswith("conv2.weight"):
                put(("residual_blocks", str(i), "conv2", "kernel"),
                    v.transpose(2, 3, 1, 0))
            elif sub.endswith("conv3.weight"):
                put(("residual_blocks", str(i), "conv3", "kernel"),
                    v.transpose(2, 3, 1, 0))
            elif sub.endswith(".weight"):
                norm = sub.split(".")[0]
                put(("residual_blocks", str(i), norm, "scale"), v)
            elif sub.endswith(".bias"):
                norm = sub.split(".")[0]
                put(("residual_blocks", str(i), norm, "bias"), v)
    return jax.tree_util.tree_map(np.ascontiguousarray, out)


def params_to_torch_state_dict(params: Params, cfg: ModelConfig) -> Dict:
    """Inverse converter (for round-trip tests and export)."""
    p = jax.tree_util.tree_map(np.asarray, params)
    sd: Dict[str, np.ndarray] = {}
    sd["patch_embed.proj.weight"] = p["patch_embed"]["kernel"].transpose(
        3, 2, 0, 1)
    sd["patch_embed.proj.bias"] = p["patch_embed"]["bias"]
    for tok in ("mask_token", "segment_token_x", "segment_token_y",
                "type_token_cls", "type_token_ins"):
        if tok in p:
            sd[tok] = p[tok].reshape(1, 1, 1, -1)
    if "pos_embed" in p:
        sd["pos_embed"] = p["pos_embed"][None]
    sd["norm.weight"] = p["norm"]["scale"]
    sd["norm.bias"] = p["norm"]["bias"]
    sd["decoder_embed.weight"] = p["decoder_embed"]["kernel"].T
    sd["decoder_embed.bias"] = p["decoder_embed"]["bias"]
    dp = p["decoder_pred"]
    sd["decoder_pred.0.weight"] = dp["conv1"]["kernel"].transpose(3, 2, 0, 1)
    sd["decoder_pred.0.bias"] = dp["conv1"]["bias"]
    sd["decoder_pred.1.weight"] = dp["ln"]["scale"]
    sd["decoder_pred.1.bias"] = dp["ln"]["bias"]
    sd["decoder_pred.3.weight"] = dp["conv2"]["kernel"].transpose(3, 2, 0, 1)
    sd["decoder_pred.3.bias"] = dp["conv2"]["bias"]
    b = p["blocks"]
    for i in range(cfg.depth):
        sd[f"blocks.{i}.norm1.weight"] = b["norm1"]["scale"][i]
        sd[f"blocks.{i}.norm1.bias"] = b["norm1"]["bias"][i]
        sd[f"blocks.{i}.norm2.weight"] = b["norm2"]["scale"][i]
        sd[f"blocks.{i}.norm2.bias"] = b["norm2"]["bias"][i]
        sd[f"blocks.{i}.attn.qkv.weight"] = b["attn"]["qkv"]["kernel"][i].T
        sd[f"blocks.{i}.attn.qkv.bias"] = b["attn"]["qkv"]["bias"][i]
        sd[f"blocks.{i}.attn.proj.weight"] = b["attn"]["proj"]["kernel"][i].T
        sd[f"blocks.{i}.attn.proj.bias"] = b["attn"]["proj"]["bias"][i]
        if "rel_pos_h" in b["attn"]:
            # window-trained param trees export each block's table at its
            # own size, as the reference stores them (models_painter.py:309)
            win = ("rel_pos_h_win" in b["attn"]
                   and i in cfg.window_block_indexes)
            suffix = "_win" if win else ""
            sd[f"blocks.{i}.attn.rel_pos_h"] = \
                b["attn"]["rel_pos_h" + suffix][i]
            sd[f"blocks.{i}.attn.rel_pos_w"] = \
                b["attn"]["rel_pos_w" + suffix][i]
        sd[f"blocks.{i}.mlp.fc1.weight"] = b["mlp"]["fc1"]["kernel"][i].T
        sd[f"blocks.{i}.mlp.fc1.bias"] = b["mlp"]["fc1"]["bias"][i]
        sd[f"blocks.{i}.mlp.fc2.weight"] = b["mlp"]["fc2"]["kernel"][i].T
        sd[f"blocks.{i}.mlp.fc2.bias"] = b["mlp"]["fc2"]["bias"][i]
    for i, rp in p.get("residual_blocks", {}).items():
        for conv in ("conv1", "conv2", "conv3"):
            sd[f"blocks.{i}.residual.{conv}.weight"] = \
                rp[conv]["kernel"].transpose(3, 2, 0, 1)
        for norm in ("norm1", "norm2", "norm3"):
            sd[f"blocks.{i}.residual.{norm}.weight"] = rp[norm]["scale"]
            sd[f"blocks.{i}.residual.{norm}.bias"] = rp[norm]["bias"]
    return sd


def _merge(dst: Params, src: Params, path=()):
    """Overlay src onto dst where the path exists and shapes match.

    torch ``strict=False`` semantics: unexpected checkpoint keys are
    ignored (reported, like shape mismatches), never inserted — so e.g.
    loading a SegGPT .pth into a Painter config cannot add
    type_token_cls/ins leaves and change the pytree structure that
    optimizer/sharding trees were built from."""
    skipped = []
    for k, v in src.items():
        cur = dst.get(k)
        if isinstance(v, dict):
            if not isinstance(cur, dict):
                skipped.append(("/".join(path + (k,)), "unexpected",
                                "absent"))
                continue
            skipped += _merge(cur, v, path + (k,))
        elif cur is None:
            skipped.append(("/".join(path + (k,)), tuple(v.shape),
                            "absent"))
        elif tuple(cur.shape) != tuple(v.shape):
            skipped.append(("/".join(path + (k,)),
                            tuple(v.shape), tuple(cur.shape)))
        else:
            dst[k] = v
    return skipped


def interpolate_pos_embed_table(table: np.ndarray,
                                target_positions: int,
                                has_cls: bool = True) -> np.ndarray:
    """Bicubic-resize a square pos-embed table to a new square size,

    keeping the cls slot — the reference's checkpoint surgery
    (``Painter/util/pos_embed.py:75-96``)."""
    import jax.numpy as jnp
    from painter_tpu.ops.resample import resize2d
    extra = 1 if has_cls else 0
    grid = table[extra:]
    src = int(round(grid.shape[0] ** 0.5))
    dst = int(round((target_positions - extra) ** 0.5))
    assert src * src == grid.shape[0], grid.shape
    assert dst * dst == target_positions - extra, target_positions
    resized = np.asarray(resize2d(
        jnp.asarray(grid.reshape(src, src, -1)), (dst, dst), "bicubic",
        h_axis=0, w_axis=1)).reshape(dst * dst, -1)
    return np.concatenate([table[:extra], resized]).astype(table.dtype)


def load_torch_params(path: str, cfg: ModelConfig,
                      init: Optional[Params] = None,
                      key: str = "model") -> Params:
    """Load a reference .pth checkpoint.

    With ``init`` given, converted tensors overlay the init tree;
    a size-mismatched pos_embed is bicubic-interpolated
    (``main_train.py:199-224`` + ``util/pos_embed.py:75-96``) and other
    shape-mismatched entries keep the init value (strict=False).
    """
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get(key, ckpt) if isinstance(ckpt, dict) else ckpt
    converted = convert_torch_state_dict(sd, cfg)
    if init is None:
        return converted
    out = jax.tree_util.tree_map(np.asarray, init)
    if "pos_embed" in converted and "pos_embed" in out and \
            converted["pos_embed"].shape != out["pos_embed"].shape:
        converted["pos_embed"] = interpolate_pos_embed_table(
            converted["pos_embed"], out["pos_embed"].shape[0],
            cfg.pretrain_use_cls_token)
        print("[checkpoint] interpolated pos_embed to "
              f"{converted['pos_embed'].shape}")
    skipped = _merge(out, converted)
    for name, got, want in skipped:
        print(f"[checkpoint] skipping {name}: ckpt {got} vs model {want}")
    return out


# ---------------------------------------------------------------------------
# Orbax train-state store (save/auto-resume)
# ---------------------------------------------------------------------------

def checkpoint_manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(directory, options=options)


def save_state(manager, step: int, state: Any) -> None:
    import orbax.checkpoint as ocp
    manager.save(step, args=ocp.args.StandardSave(state))


def restore_state(manager, state_like: Any, step: Optional[int] = None):
    """Restore latest (or given) step into the structure/shardings of

    ``state_like``; returns (state, step) or (state_like, None) when no
    checkpoint exists — the ``--auto_resume`` contract
    (misc.py:333-363)."""
    import orbax.checkpoint as ocp
    step = manager.latest_step() if step is None else step
    if step is None:
        return state_like, None
    restored = manager.restore(
        step, args=ocp.args.StandardRestore(state_like))
    return restored, step


def export_torch_checkpoint(params: Params, cfg: ModelConfig,
                            out_path: str) -> None:
    """Save our params as a reference-format torch .pth (so checkpoints
    trained here load in the original torch codebase)."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in params_to_torch_state_dict(params, cfg).items()}
    torch.save({"model": sd}, out_path)


def _export_cli():
    import argparse
    p = argparse.ArgumentParser("painter-tpu checkpoint export")
    p.add_argument("--orbax_dir", required=True,
                   help="CheckpointManager directory (train output)")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--model", required=True, help="config preset name")
    p.add_argument("--out", required=True, help="output .pth path")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from painter_tpu import configs
    from painter_tpu.models import incontext_vit as model_lib
    from painter_tpu.train import optim, step as step_lib

    cfg = configs.get_config(args.model)
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    optimizer = optim.make_optimizer(params, cfg, optim.OptimConfig())
    state = step_lib.init_train_state(params, optimizer)
    manager = checkpoint_manager(args.orbax_dir)
    state, step = restore_state(manager, state, step=args.step)
    assert step is not None, f"no checkpoint found in {args.orbax_dir}"
    export_torch_checkpoint(state["params"], cfg, args.out)
    print(f"exported step {step} -> {args.out}")


if __name__ == "__main__":
    _export_cli()
