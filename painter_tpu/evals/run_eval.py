"""Per-task evaluation drivers — the L5+L6 pipeline as one CLI.

Mirrors the reference's two-phase shape (SURVEY.md §3.2): phase 1 paints
predictions for a validation set with a fixed prompt pair
(``eval/*/painter_inference_*.py``), phase 2 decodes painted PNGs into
task outputs and computes metrics (``eval/*/*EvaluatorCustom.py``,
``eval_with_pngs.py``). Differences by design: both phases live in one
driver; the val file list is sharded by ``--num_shards/--shard`` instead
of torch DistributedSampler (``ddp_utils.py:84-108``), and preprocessing
+ decode run on-device.

Usage:
  python -m painter_tpu.evals.run_eval --task ade20k_semseg \
      --ckpt_path painter_vit_large.pth --image_dir .../validation \
      --gt_dir .../annotations --prompt_image p.jpg --prompt_target t.png \
      --output_dir out/
"""
from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Optional


def get_args_parser():
    p = argparse.ArgumentParser("painter-tpu eval", add_help=False)
    p.add_argument("--task", required=True,
                   choices=["ade20k_semseg", "coco_semseg", "coco_inst",
                            "depth", "derain", "sidd", "lol",
                            "seggpt_semseg", "pose"])
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--model", default=None,
                   help="preset name; default picked per task")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--image_ext", default="*.jpg")
    p.add_argument("--gt_dir", default=None,
                   help="labels (semseg) / depth pngs / clean images")
    p.add_argument("--gt_ext", default="*.png")
    p.add_argument("--prompt_image", required=True)
    p.add_argument("--prompt_target", required=True)
    p.add_argument("--input_size", type=int, default=448)
    p.add_argument("--output_dir", default="./eval_out")
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--dist_type", default="abs")
    p.add_argument("--max_images", type=int, default=-1)
    p.add_argument("--skip_metrics", action="store_true")
    p.add_argument("--decode_only", action="store_true",
                   help="phase 2 only: score existing painted PNGs in "
                        "--output_dir (the reference's separate decode "
                        "process, e.g. after multi-shard painting)")
    return p


TASK_TO_ENGINE_SPEC = {
    "ade20k_semseg": "ade20k_semseg",
    "coco_semseg": "coco_semseg",
    "coco_inst": "coco_inst",     # paint @560, decode via run_panoptic
    "seggpt_semseg": "seggpt",
    "depth": "depth",
    "derain": "restoration",
    "sidd": "restoration",
    "lol": "restoration",
    "pose": "pose",               # paints 256x192 crops; AP via run_pose
}


def build_model(args):
    import jax
    from painter_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from painter_tpu import configs
    from painter_tpu.infer.engine import InContextModel
    from painter_tpu.models import incontext_vit as model_lib
    from painter_tpu.train import checkpoint as ckpt_lib

    model_name = args.model or (
        "seggpt_vit_large_patch16_input896x448" if args.task.startswith(
            "seggpt")
        else "painter_vit_large_patch16_input896x448_win_dec64_8glb_sl1")
    cfg = configs.get_config(
        model_name, img_size=(2 * args.input_size, args.input_size),
        dtype="bfloat16")
    init = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    params = (ckpt_lib.load_torch_params(args.ckpt_path, cfg, init=init)
              if args.ckpt_path else init)
    return InContextModel(cfg, params)


def _load_depth_target(path: str, res: int):
    """NYUv2 depth png -> [0,1] RGB at res^2, matching the reference's
    load order exactly (painter_inference_depth.py:140-145): /10000*255
    float -> PIL 'F' -> convert RGB (clamps+casts) -> default resize."""
    import numpy as np
    from PIL import Image
    tgt = np.array(Image.open(path)) / 10000.0 * 255
    tgt = Image.fromarray(tgt).convert("RGB").resize((res, res))
    return np.array(tgt) / 255.0


def paint_predictions(args, model) -> list:
    """Phase 1: fixed-prompt painting of the sharded val list."""
    import numpy as np
    from PIL import Image
    from painter_tpu.infer.engine import (TASK_SPECS, build_prompt_batch,
                                          scale_and_resize, _load_rgb)

    res = args.input_size
    spec = TASK_SPECS[TASK_TO_ENGINE_SPEC[args.task]]
    files = sorted(glob.glob(os.path.join(args.image_dir, args.image_ext)))
    files = files[args.shard::args.num_shards]
    if args.max_images > 0:
        files = files[:args.max_images]
    os.makedirs(args.output_dir, exist_ok=True)

    # Painter protocol resizes the prompt target with PIL default
    # (bicubic); SegGPT uses NEAREST (painter_inference_segm.py:138-141
    # vs seggpt_engine.py:70-72)
    nearest_tgt = args.task.startswith("seggpt")
    img2 = _load_rgb(args.prompt_image, res)
    if args.task == "depth":
        # the depth prompt target is a raw NYUv2 sync_depth uint16 png
        # mapped /10000*255 BEFORE RGB conversion
        # (painter_inference_depth.py:140-145); plain convert('RGB')
        # would saturate uint16 values to ~255
        tgt2 = _load_depth_target(args.prompt_target, res)
    else:
        tgt2 = _load_rgb(args.prompt_target, res, nearest=nearest_tgt)

    outputs = []
    for path in files:
        image = Image.open(path).convert("RGB")
        size = image.size
        query = np.array(image.resize((res, res))) / 255.0
        imgs, tgts = build_prompt_batch(query, [(img2, tgt2)])
        out = model.run_one_image(imgs, tgts)
        out = scale_and_resize(out, size, spec)
        base = os.path.splitext(os.path.basename(path))[0] + ".png"
        out_path = os.path.join(args.output_dir, base)
        if args.task == "depth":
            # x1000 mm uint16 png (painter_inference_depth.py:69-74 via
            # x10000 scale then /1000 at eval -> store int directly)
            Image.fromarray(out.astype(np.int32), mode="I").save(out_path)
        elif spec.out_scale == 1.0:
            Image.fromarray(
                (np.clip(out, 0, 1) * 255).astype(np.uint8)).save(out_path)
            if args.task == "sidd":
                # reference also emits Idenoised .mat blocks
                # (painter_inference_sidd.py:169)
                from scipy.io import savemat
                savemat(out_path.replace(".png", ".mat"),
                        {"Idenoised_crop": np.clip(out, 0, 1)})
        else:
            Image.fromarray(out.astype(np.uint8)).save(out_path)
        outputs.append((path, out_path))
    return outputs


def compute_metrics(args, outputs) -> Optional[dict]:
    """Phase 2: decode + metric."""
    import numpy as np
    from PIL import Image

    if args.gt_dir is None:
        return None

    def gt_for(img_path):
        base = os.path.splitext(os.path.basename(img_path))[0]
        cands = glob.glob(os.path.join(args.gt_dir, base + ".*"))
        return cands[0] if cands else None

    if args.task in ("ade20k_semseg", "coco_semseg"):
        from painter_tpu.evals.semseg import SemSegEvaluator
        from painter_tpu.ops.palette import (ade20k_palette,
                                             coco_semseg_palette)
        pal = (ade20k_palette() if args.task == "ade20k_semseg"
               else coco_semseg_palette())
        ev = SemSegEvaluator(len(pal), pal, dist_type=args.dist_type)
        for img_path, pred_path in outputs:
            gt_path = gt_for(img_path)
            if gt_path is None:
                continue
            gt = np.asarray(Image.open(gt_path), np.int64)
            if args.task == "ade20k_semseg":
                gt = np.where(gt == 0, 255, gt - 1)  # 1-based + ignore
            pred = np.asarray(Image.open(pred_path), np.float32)
            ev.process(pred, gt)
        return ev.evaluate()

    if args.task == "depth":
        from painter_tpu.evals.depth import DepthEvaluator
        ev = DepthEvaluator(min_depth=1e-3, max_depth=10.0,
                            eigen_crop=True)
        for img_path, pred_path in outputs:
            gt_path = gt_for(img_path)
            if gt_path is None:
                continue
            pred = np.asarray(Image.open(pred_path)).astype(np.float64) \
                / 1000.0
            gt = np.asarray(Image.open(gt_path)).astype(np.float64) \
                / 1000.0
            ev.process(pred, gt)
        return ev.evaluate()

    if args.task in ("derain", "sidd", "lol"):
        from painter_tpu.evals.restoration import RestorationEvaluator
        ev = RestorationEvaluator(data_range=1.0)
        for img_path, pred_path in outputs:
            gt_path = gt_for(img_path)
            if gt_path is None:
                continue
            pred = np.asarray(Image.open(pred_path), np.float64) / 255.0
            gt = np.asarray(Image.open(gt_path).convert("RGB"),
                            np.float64) / 255.0
            ev.process(pred, gt)
        return ev.evaluate()
    return None


def recover_outputs(args) -> list:
    """Pair existing painted PNGs in output_dir with their source images."""
    outputs = []
    for pred_path in sorted(glob.glob(os.path.join(args.output_dir,
                                                   "*.png"))):
        base = os.path.splitext(os.path.basename(pred_path))[0]
        cands = glob.glob(os.path.join(args.image_dir, base + ".*"))
        if cands:
            outputs.append((cands[0], pred_path))
    return outputs


def main():
    args = get_args_parser().parse_args()
    if args.decode_only:
        outputs = recover_outputs(args)
        print(f"decoding {len(outputs)} existing predictions")
        metrics = compute_metrics(args, outputs)
        if metrics is not None:
            print(json.dumps({"task": args.task, **metrics}))
        return
    model = build_model(args)
    print(f"model ready; painting shard {args.shard}/{args.num_shards}")
    outputs = paint_predictions(args, model)
    print(f"painted {len(outputs)} predictions -> {args.output_dir}")
    if not args.skip_metrics:
        metrics = compute_metrics(args, outputs)
        if metrics is not None:
            print(json.dumps({"task": args.task, **metrics}))
            with open(os.path.join(args.output_dir, "metrics.json"),
                      "w") as f:
                json.dump(metrics, f)


if __name__ == "__main__":
    main()
