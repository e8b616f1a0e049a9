"""End-to-end eval driver: paint -> decode -> metrics on synthetic data."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from painter_tpu.evals.run_eval import (build_model, compute_metrics,
                                        get_args_parser, paint_predictions)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("evaldata")
    rng = np.random.RandomState(0)
    (root / "images").mkdir()
    (root / "gts").mkdir()
    for i in range(3):
        Image.fromarray((rng.rand(40, 36, 3) * 255).astype(np.uint8)).save(
            root / "images" / f"im{i}.jpg")
        Image.fromarray(rng.randint(0, 150, (40, 36)).astype(
            np.uint8)).save(root / "gts" / f"im{i}.png")
    Image.fromarray((rng.rand(40, 36, 3) * 255).astype(np.uint8)).save(
        root / "prompt.jpg")
    Image.fromarray((rng.rand(40, 36, 3) * 255).astype(np.uint8)).save(
        root / "ptarget.png")
    return root


def _args(root, out, task, extra=()):
    return get_args_parser().parse_args([
        "--task", task, "--model", "tiny_test",
        "--image_dir", str(root / "images"),
        "--gt_dir", str(root / "gts"),
        "--prompt_image", str(root / "prompt.jpg"),
        "--prompt_target", str(root / "ptarget.png"),
        "--input_size", "32", "--output_dir", str(out), *extra])


def test_eval_driver_semseg(synth, tmp_path):
    args = _args(synth, tmp_path / "out", "ade20k_semseg")
    model = build_model(args)
    outputs = paint_predictions(args, model)
    assert len(outputs) == 3
    pred = np.asarray(Image.open(outputs[0][1]))
    assert pred.shape == (40, 36, 3)  # resized back to original
    metrics = compute_metrics(args, outputs)
    assert set(metrics) >= {"mIoU", "pACC"}
    assert np.isfinite(metrics["mIoU"])


def test_eval_driver_restoration_and_sharding(synth, tmp_path):
    args = _args(synth, tmp_path / "out2", "lol",
                 extra=["--num_shards", "2", "--shard", "0"])
    model = build_model(args)
    outputs = paint_predictions(args, model)
    assert len(outputs) == 2  # 3 images sharded 2-way -> shard 0 gets 2
    metrics = compute_metrics(args, outputs)
    assert "psnr" in metrics and "ssim" in metrics


def test_eval_driver_depth(synth, tmp_path):
    # NYU-sized (480x640) images and mm-scaled GT pngs
    rng = np.random.RandomState(1)
    imd = synth / "images_depth"
    gtd = synth / "gts_depth"
    imd.mkdir(exist_ok=True)
    gtd.mkdir(exist_ok=True)
    for i in range(2):
        Image.fromarray((rng.rand(480, 640, 3) * 255).astype(
            np.uint8)).save(imd / f"im{i}.jpg")
        Image.fromarray(
            (rng.rand(480, 640) * 9000).astype(np.int32), mode="I").save(
            gtd / f"im{i}.png")
    # the depth prompt target is a raw sync_depth png (uint16-like),
    # loaded /10000*255 before RGB conversion
    Image.fromarray((rng.rand(480, 640) * 9000).astype(np.int32),
                    mode="I").save(synth / "ptarget_depth.png")
    args = _args(synth, tmp_path / "out3", "depth")
    args.image_dir = str(imd)
    args.gt_dir = str(gtd)
    args.prompt_target = str(synth / "ptarget_depth.png")
    model = build_model(args)
    outputs = paint_predictions(args, model)
    pred = np.asarray(Image.open(outputs[0][1]))
    assert pred.shape == (480, 640) and pred.max() <= 10000
    metrics = compute_metrics(args, outputs)
    assert {"rmse", "abs_rel", "d1"} <= set(metrics)
    assert np.isfinite(metrics["rmse"])


def test_sidd_mat_protocol(synth, tmp_path):
    """ValidationNoisyBlocksSrgb.mat in -> Idenoised.mat out + PSNR/SSIM
    (painter_inference_sidd.py:112-169)."""
    from scipy.io import loadmat, savemat
    from painter_tpu.evals.run_eval import run_sidd_mat
    rng = np.random.RandomState(3)
    gt = (rng.rand(2, 3, 24, 24, 3) * 255).astype(np.float32)
    noisy = np.clip(gt + rng.randn(*gt.shape) * 8, 0, 255).astype(
        np.float32)
    savemat(synth / "noisy.mat", {"ValidationNoisyBlocksSrgb": noisy})
    savemat(synth / "gt.mat", {"ValidationGtBlocksSrgb": gt})
    args = _args(synth, tmp_path / "sidd_out", "sidd")
    args.sidd_mat = str(synth / "noisy.mat")
    args.sidd_gt_mat = str(synth / "gt.mat")
    model = build_model(args)
    metrics = run_sidd_mat(args, model)
    assert np.isfinite(metrics["psnr"]) and 0 <= metrics["ssim"] <= 1
    out = loadmat(tmp_path / "sidd_out" / "Idenoised.mat")["Idenoised"]
    assert out.shape == noisy.shape
    assert out.min() >= 0 and out.max() <= 1


def test_derain_sweep_aggregate(synth, tmp_path):
    """Multi-dataset derain sweep prints per-set + aggregate PSNR/SSIM
    (painter_inference_derain.py:120-130)."""
    from painter_tpu.evals.run_eval import run_derain_sweep
    rng = np.random.RandomState(4)
    root = synth / "derain"
    counts = {"Rain100L": 2, "Test100": 3}
    for dset, n in counts.items():
        (root / dset / "input").mkdir(parents=True)
        (root / dset / "target").mkdir(parents=True)
        for i in range(n):
            clean = (rng.rand(20, 22, 3) * 255).astype(np.uint8)
            rain = np.clip(clean + rng.randn(20, 22, 3) * 20, 0,
                           255).astype(np.uint8)
            Image.fromarray(rain).save(
                root / dset / "input" / f"r{i}.jpg")
            Image.fromarray(clean).save(
                root / dset / "target" / f"r{i}.jpg")
    args = _args(synth, tmp_path / "derain_out", "derain")
    args.derain_root = str(root)
    model = build_model(args)
    results = run_derain_sweep(args, model)
    assert set(counts) <= set(results)
    assert results["num_images"] == 5
    agg = results["aggregate"]
    assert np.isfinite(agg["psnr"]) and np.isfinite(agg["ssim"])
    # the aggregate pools all images, not the mean of per-set means
    assert agg["n"] == 5


def test_decode_only_mode(synth, tmp_path):
    """Phase 1 with two shards, then one decode_only pass over all PNGs."""
    out = tmp_path / "out_sharded"
    for shard in (0, 1):
        args = _args(synth, out, "ade20k_semseg",
                     extra=["--num_shards", "2", "--shard", str(shard)])
        model = build_model(args)
        paint_predictions(args, model)
    args = _args(synth, out, "ade20k_semseg", extra=["--decode_only"])
    from painter_tpu.evals.run_eval import recover_outputs, compute_metrics
    outputs = recover_outputs(args)
    assert len(outputs) == 3  # both shards' outputs recovered
    metrics = compute_metrics(args, outputs)
    assert np.isfinite(metrics["mIoU"])


def test_eval_driver_batched_matches_per_image(synth, tmp_path):
    """--batch_size 1 (the reference's loop) and the batched default
    paint identical predictions; --n_dp 2 shards the batch on the
    virtual device mesh and still matches."""
    outs = {}
    for name, extra in (("b1", ["--batch_size", "1"]),
                        ("b4", ["--batch_size", "4"]),
                        ("dp", ["--batch_size", "4", "--n_dp", "2"])):
        args = _args(synth, tmp_path / f"bm_{name}", "ade20k_semseg",
                     extra=extra)
        model = build_model(args)
        outputs = paint_predictions(args, model)
        assert len(outputs) == 3
        outs[name] = [np.asarray(Image.open(p)) for _, p in outputs]
    # sharded/unsharded and batched/unbatched executions may differ by
    # fp rounding (different fusion/reduce orders) -> one uint8 step
    for a, b, c in zip(outs["b1"], outs["b4"], outs["dp"]):
        np.testing.assert_allclose(a.astype(np.int16), b.astype(np.int16),
                                   atol=1)
        np.testing.assert_allclose(b.astype(np.int16), c.astype(np.int16),
                                   atol=1)
