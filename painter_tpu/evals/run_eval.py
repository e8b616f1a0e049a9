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
    p.add_argument("--image_dir", default=None)
    p.add_argument("--image_ext", default="*.jpg")
    p.add_argument("--gt_dir", default=None,
                   help="labels (semseg) / depth pngs / clean images")
    p.add_argument("--sidd_mat", default=None,
                   help="ValidationNoisyBlocksSrgb.mat (40x32x256x256x3); "
                        "replaces --image_dir for the real SIDD protocol")
    p.add_argument("--sidd_gt_mat", default=None,
                   help="ValidationGtBlocksSrgb.mat for PSNR/SSIM")
    p.add_argument("--derain_root", default=None,
                   help="derain test root containing "
                        "{Rain100L,Rain100H,Test100,Test1200,Test2800}/"
                        "{input,target}; replaces --image_dir and runs "
                        "the 5-dataset sweep with an aggregate")
    p.add_argument("--gt_ext", default="*.png")
    p.add_argument("--prompt_image", required=True)
    p.add_argument("--prompt_target", required=True)
    p.add_argument("--input_size", type=int, default=448)
    p.add_argument("--output_dir", default="./eval_out")
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--dist_type", default="abs")
    p.add_argument("--max_images", type=int, default=-1)
    p.add_argument("--batch_size", type=int, default=1,
                   help="queries per device batch in phase 1. Default 1 "
                        "bit-matches the reference's per-image loop; "
                        ">1 runs the batched path (~2.6x at 8) whose "
                        "painted PNGs can differ by +-1 uint8 step from "
                        "the per-image loop (XLA fusion/reduce order). "
                        "Raise it once metric parity vs the released "
                        "checkpoints is confirmed (docs/EVAL.md).")
    p.add_argument("--n_dp", type=int, default=1,
                   help=">1: shard the query batch over a dp mesh of "
                        "that many local devices (single-process "
                        "multi-chip eval; combine with --num_shards "
                        "for multi-host)")
    p.add_argument("--quant", default="none",
                   choices=["none", "int8", "int8-fused"],
                   help="int8: w8a8 quantized serving gemms (ops/quant.py);"
                        " int8-fused routes the MLP through the fused "
                        "Pallas kernel. Off by default: the frozen eval "
                        "protocols run fp-faithful until real-checkpoint "
                        "parity exists")
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
    import numpy as np
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
    if getattr(args, "quant", "none") in ("int8", "int8-fused"):
        from painter_tpu.ops import quant as quant_lib
        params = quant_lib.quantize_params(params)
        if args.quant == "int8-fused":
            quant_lib.MLP_IMPL = "fused"
    mesh = None
    if getattr(args, "n_dp", 1) > 1:
        from jax.sharding import Mesh
        devs = jax.devices()[:args.n_dp]
        if len(devs) < args.n_dp:
            raise SystemExit(f"--n_dp {args.n_dp} > {len(jax.devices())} "
                             "local devices")
        mesh = Mesh(np.asarray(devs), ("dp",))
    return InContextModel(cfg, params, mesh=mesh)


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

    # uint8 output fetch is protocol-exact only when the host-side
    # post-processing is a nearest resize of the x255-clipped image
    # (nearest-gather commutes with the per-pixel uint8 cast); bilinear
    # (ade20k/coco semseg, depth) and bicubic (restoration) tasks must
    # resize in float, so they keep the fp32 fetch
    u8_out = (spec.out_scale == 255.0 and spec.resize_mode == "nearest"
              and spec.clip == (0.0, 255.0) and not spec.channel_mean)
    outputs = []
    bs = max(1, args.batch_size)
    for i0 in range(0, len(files), bs):
        chunk = files[i0:i0 + bs]
        queries, sizes = [], []
        for path in chunk:
            image = Image.open(path).convert("RGB")
            sizes.append(image.size)
            # raw uint8; the batched path does /255 in-graph (bit-exact
            # — ops/image.from_uint8), the per-image path divides here
            queries.append(np.array(image.resize((res, res))))
        if bs == 1 and model.mesh is None:
            # --batch_size 1 = the reference's per-image mode; a ragged
            # tail chunk must NOT take this path (it would trigger a
            # second full compile for one image — pad it instead)
            imgs, tgts = build_prompt_batch(queries[0] / 255.0,
                                            [(img2, tgt2)])
            outs = model.run_one_image(imgs, tgts)[None]
        else:
            # batched independent-query path (pad the tail chunk so one
            # compiled shape serves the whole sweep); the shared-prompt
            # variant uploads only the query halves — the prompt pair
            # ships once and broadcasts in-graph
            real = len(queries)
            while len(queries) < bs:
                queries.append(queries[0])
            outs = model.run_queries_shared(
                np.stack(queries), img2, tgt2, real_count=real,
                out_dtype=np.uint8 if u8_out else np.float32)
        for path, size, out in zip(chunk, sizes, outs):
            if u8_out and out.dtype == np.uint8:
                # already x255-clipped on device; nearest resize is a
                # pure gather, so going through float32 and back is
                # exact (integral values round-trip)
                from painter_tpu.data.transforms import _np_resize2d
                out = _np_resize2d(out.astype(np.float32),
                                   (size[1], size[0]), "nearest")
            else:
                out = scale_and_resize(out, size, spec)
            base = os.path.splitext(os.path.basename(path))[0] + ".png"
            out_path = os.path.join(args.output_dir, base)
            if args.task == "depth":
                # x1000 mm uint16 png (painter_inference_depth.py:69-74
                # via x10000 scale then /1000 at eval -> store int)
                Image.fromarray(out.astype(np.int32),
                                mode="I").save(out_path)
            elif spec.out_scale == 1.0:
                Image.fromarray(
                    (np.clip(out, 0, 1) * 255).astype(
                        np.uint8)).save(out_path)
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


DERAIN_DATASETS = ("Rain100L", "Rain100H", "Test100", "Test1200",
                   "Test2800")


def run_sidd_mat(args, model) -> Optional[dict]:
    """The real SIDD protocol (painter_inference_sidd.py:112-169):

    paint every 256^2 block of ValidationNoisyBlocksSrgb.mat (queries
    resized 256->448 with cv2 bilinear on [0,1] floats), clip to [0,1],
    emit Idenoised.mat; PSNR/SSIM against the GT blocks .mat when given
    (the reference defers metrics to unshipped MATLAB scripts)."""
    import cv2
    import numpy as np
    from scipy.io import loadmat, savemat
    from painter_tpu.infer.engine import (TASK_SPECS, build_prompt_batch,
                                          scale_and_resize, _load_rgb)

    res = args.input_size
    noisy = np.float32(loadmat(args.sidd_mat)["ValidationNoisyBlocksSrgb"])
    noisy /= 255.0
    n_img, n_blk = noisy.shape[:2]
    img2 = _load_rgb(args.prompt_image, res)
    tgt2 = _load_rgb(args.prompt_target, res)
    os.makedirs(args.output_dir, exist_ok=True)

    bs = max(1, args.batch_size)
    restored = np.zeros_like(noisy)
    flat = [(i, j) for i in range(n_img) for j in range(n_blk)]
    for k0 in range(0, len(flat), bs):
        chunk = flat[k0:k0 + bs]
        queries = [cv2.resize(noisy[i, j], (res, res)) for i, j in chunk]
        real = len(queries)
        while len(queries) < bs:
            queries.append(queries[0])
        outs = model.run_queries_shared(
            np.stack(queries).astype(np.float32), img2, tgt2,
            real_count=real)
        for (i, j), out in zip(chunk, outs):
            out = scale_and_resize(out, noisy[i, j].shape[1::-1],
                                   TASK_SPECS["restoration"])
            restored[i, j] = np.clip(out, 0, 1)
    savemat(os.path.join(args.output_dir, "Idenoised.mat"),
            {"Idenoised": restored})
    print(f"Idenoised.mat written ({n_img}x{n_blk} blocks)")
    if not args.sidd_gt_mat:
        return None
    gt = np.float32(loadmat(args.sidd_gt_mat)["ValidationGtBlocksSrgb"])
    gt /= 255.0
    from painter_tpu.evals.restoration import RestorationEvaluator
    ev = RestorationEvaluator(data_range=1.0)
    for i in range(n_img):
        for j in range(n_blk):
            ev.process(restored[i, j].astype(np.float64),
                       gt[i, j].astype(np.float64))
    return ev.evaluate()


def run_derain_sweep(args, model) -> dict:
    """5-dataset derain sweep + aggregate PSNR/SSIM

    (painter_inference_derain.py:120-130; the published 29.42/0.867 is
    the aggregate over all five test sets)."""
    import argparse as _ap
    from painter_tpu.evals.restoration import RestorationEvaluator
    import numpy as np
    from PIL import Image

    agg = RestorationEvaluator(data_range=1.0)
    results = {}
    n_total = 0
    for dset in DERAIN_DATASETS:
        src = os.path.join(args.derain_root, dset, "input")
        if not os.path.isdir(src):
            print(f"[derain] {dset}: missing, skipped")
            continue
        sub = _ap.Namespace(**vars(args))
        sub.image_dir = src
        sub.gt_dir = os.path.join(args.derain_root, dset, "target")
        sub.output_dir = os.path.join(args.output_dir, dset)
        outputs = []
        for ext in ("*.png", "*.jpg"):
            sub.image_ext = ext
            outputs += paint_predictions(sub, model)
        ev = RestorationEvaluator(data_range=1.0)
        for img_path, pred_path in outputs:
            base = os.path.splitext(os.path.basename(img_path))[0]
            cands = glob.glob(os.path.join(sub.gt_dir, base + ".*"))
            if not cands:
                print(f"[derain] {dset}: no GT for {base}, skipped")
                continue
            pred = np.asarray(Image.open(pred_path), np.float64) / 255.0
            gt = np.asarray(Image.open(cands[0]).convert("RGB"),
                            np.float64) / 255.0
            ev.process(pred, gt)
            agg.process(pred, gt)
        results[dset] = ev.evaluate()
        n_total += len(outputs)
    results["aggregate"] = agg.evaluate()
    results["num_images"] = n_total
    return results


def compute_metrics(args, outputs) -> Optional[dict]:
    """Phase 2: decode + metric."""
    import numpy as np
    from PIL import Image

    if args.gt_dir is None:
        return None

    skipped = [0]

    def gt_for(img_path):
        base = os.path.splitext(os.path.basename(img_path))[0]
        cands = glob.glob(os.path.join(args.gt_dir, base + ".*"))
        if not cands:
            # surface dataset-layout mismatches instead of silently
            # shrinking the eval set
            skipped[0] += 1
            print(f"[warn] no GT matching {base}.* in {args.gt_dir}")
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
    if args.task == "sidd" and args.sidd_mat:
        metrics = run_sidd_mat(args, model)
        if metrics is not None:
            print(json.dumps({"task": "sidd", **metrics}))
        return
    if args.task == "derain" and args.derain_root:
        results = run_derain_sweep(args, model)
        print(json.dumps({"task": "derain_sweep", **results}))
        with open(os.path.join(args.output_dir, "metrics.json"),
                  "w") as f:
            json.dump(results, f)
        return
    assert args.image_dir, "--image_dir required (or --sidd_mat/" \
        "--derain_root for those protocols)"
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
