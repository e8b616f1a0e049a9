"""Checkpoint-parity harness (SURVEY.md §7 build-plan step 2).

Loads a released torch checkpoint, runs our JAX model and the fp64 torch
oracle on the same fixed stitched input, and reports output/loss
divergence. This is the correctness anchor to run as soon as
``painter_vit_large.pth`` / ``seggpt_vit_large.pth`` are on disk:

    python -m painter_tpu.utils.parity --ckpt_path painter_vit_large.pth \
        [--model painter_vit_large_patch16_input896x448_win_dec64_8glb_sl1]

Without --ckpt_path it checks a randomly initialized model (the same
check the test suite runs at tiny scale, here at full ViT-L).
"""
from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser("painter-tpu parity check")
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--model",
                   default="seggpt_vit_large_patch16_input896x448")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--tolerance", type=float, default=1e-3)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # fp32, no TPU bf16 noise
    import jax.numpy as jnp
    import numpy as np
    from painter_tpu import configs
    from painter_tpu.models import incontext_vit as m
    from painter_tpu.ops.patches import unpatchify
    from painter_tpu.train import checkpoint as ckpt_lib
    from painter_tpu.utils.torch_oracle import torch_forward

    cfg = configs.get_config(args.model, dtype="float32")
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    if args.ckpt_path:
        params = ckpt_lib.load_torch_params(args.ckpt_path, cfg,
                                            init=params)
        print(f"loaded {args.ckpt_path}")

    h, w = cfg.img_size
    length = cfg.num_patches
    rng = np.random.RandomState(2)
    imgs = rng.randn(args.batch, h, w, 3).astype(np.float32)
    tgts = rng.randn(args.batch, h, w, 3).astype(np.float32)
    mask = np.zeros((args.batch, length), np.float32)
    mask[:, length // 2:] = 1.0
    valid = np.ones((args.batch, h, w, 3), np.float32)
    seg_type = (np.zeros((args.batch, 1), np.int32)
                if cfg.seg_type_tokens else None)

    loss, pred_patches, _ = m.forward(
        params, cfg, jnp.asarray(imgs), jnp.asarray(tgts),
        jnp.asarray(mask), jnp.asarray(valid),
        seg_type=None if seg_type is None else jnp.asarray(seg_type))
    pred = np.asarray(unpatchify(pred_patches, cfg.patch_size))
    ref_loss, ref_pred = torch_forward(params, cfg, imgs, tgts, mask,
                                       valid, seg_type=seg_type)
    max_err = float(np.abs(pred - ref_pred).max())
    loss_err = abs(float(loss) - ref_loss)
    print(f"painted-output max abs err: {max_err:.3e}")
    print(f"loss abs err:              {loss_err:.3e}")
    ok = max_err < args.tolerance and loss_err < args.tolerance
    print("PARITY OK" if ok else "PARITY FAILED")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
