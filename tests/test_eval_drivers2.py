"""Panoptic + pose eval drivers end-to-end on synthetic painted data."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from painter_tpu.data import prep
from painter_tpu.evals import run_panoptic, run_pose
from painter_tpu.ops.palette import coco_semseg_palette
from painter_tpu.utils.profiling import StepTimer, device_memory_stats


def _build_panoptic_fixture(tmp_path):
    """Painted predictions == painted GT: one thing + stuff background."""
    h, w = 96, 96
    inst_dir = tmp_path / "inst"
    sem_dir = tmp_path / "sem"
    gt_dir = tmp_path / "gt"
    for d in (inst_dir, sem_dir, gt_dir):
        d.mkdir()

    # one thing instance + stuff background
    masks = np.zeros((1, h, w), np.float32)
    masks[0, 10:40, 10:40] = 1
    inst_png = prep.paint_instances(masks, (h, w))
    Image.fromarray(inst_png).save(inst_dir / "img0.png")

    pal = coco_semseg_palette()
    sem_map = np.full((h, w), 90, np.int64)           # stuff cat 90
    sem_map[10:40, 10:40] = 7                          # thing cat 7
    sem_png = pal[sem_map]
    Image.fromarray(sem_png.astype(np.uint8)).save(sem_dir / "img0.png")

    # GT panoptic png: ids 1 (thing) and 2 (stuff)
    gt_ids = np.full((h, w), 2, np.uint32)
    gt_ids[10:40, 10:40] = 1
    gt_png = np.stack([gt_ids % 256, gt_ids // 256,
                       np.zeros_like(gt_ids)], -1).astype(np.uint8)
    Image.fromarray(gt_png).save(gt_dir / "img0.png")

    # categories: raw id 700 -> contiguous thing 7... build 80 things +
    # stuff so that cat_map matches the painted contiguous ids
    categories = [{"id": 1000 + i, "isthing": 1} for i in range(80)] + \
                 [{"id": 2000 + i, "isthing": 0} for i in range(53)]
    gt_json = {
        "categories": categories,
        "annotations": [{
            "file_name": "img0.png",
            "segments_info": [
                {"id": 1, "category_id": 1000 + 7},
                {"id": 2, "category_id": 2000 + (90 - 80)},
            ],
        }],
    }
    jp = tmp_path / "gt.json"
    jp.write_text(json.dumps(gt_json))
    return inst_dir, sem_dir, gt_dir, jp


def test_panoptic_driver_perfect_predictions(tmp_path):
    """Painted predictions == painted GT must score PQ 100 on things."""
    inst_dir, sem_dir, gt_dir, jp = _build_panoptic_fixture(tmp_path)
    args = run_panoptic.get_args_parser().parse_args([
        "--inst_dir", str(inst_dir), "--semseg_dir", str(sem_dir),
        "--gt_json", str(jp), "--gt_dir", str(gt_dir),
        "--stuff_area_thresh", "100"])
    res = run_panoptic.evaluate(args)
    assert res["n_images"] == 1
    assert res["PQ_th"] == pytest.approx(100.0)
    assert res["PQ_st"] == pytest.approx(100.0)


@pytest.mark.parametrize("extra", [
    [],                                       # threshold decode
    ["--post_type", "minmax"],                # minmax decode variant
    ["--with_nms", "--nms_type", "soft"],     # keep_all + soft-NMS
    ["--with_nms", "--nms_type", "matrix"],
])
def test_panoptic_driver_instance_ap(tmp_path, extra):
    """Class-aware instance AP (COCOInstSegEvaluatorCustom role): a
    perfect painted prediction scores AP 100 in every decode/NMS mode."""
    inst_dir, sem_dir, gt_dir, jp = _build_panoptic_fixture(tmp_path)
    args = run_panoptic.get_args_parser().parse_args([
        "--inst_dir", str(inst_dir), "--semseg_dir", str(sem_dir),
        "--gt_json", str(jp), "--gt_dir", str(gt_dir),
        "--mode", "instance_ap", *extra])
    res = run_panoptic.evaluate(args)
    assert res["n_images"] == 1
    assert res["AP"] == pytest.approx(100.0), res
    assert res["AP50"] == pytest.approx(100.0)


def test_device_vote_matches_host_reference():
    """run_panoptic's jitted on-device class vote == the host reference
    (panoptic.vote_instance_classes) on random masks/paintings."""
    import jax
    import jax.numpy as jnp
    from painter_tpu.evals.panoptic import vote_instance_classes
    from painter_tpu.ops.palette import (coco_semseg_palette,
                                         color_distance_map)

    rng = np.random.RandomState(7)
    h, w, n, num_things = 40, 48, 6, 80
    sem_png = rng.randint(0, 256, (h, w, 3)).astype(np.float32)
    masks = (rng.rand(n, h, w) > 0.7).astype(np.float32)
    pal = jnp.asarray(coco_semseg_palette(), jnp.float32)

    @jax.jit
    def vote_fn(m, s):
        d = color_distance_map(s, pal, "abs")[..., :num_things]
        prob = 1.0 - d / jnp.maximum(jnp.max(d), 1e-12)
        mp = jnp.einsum("nhw,hwk->nk", m.astype(jnp.float32), prob)
        return jnp.argmax(mp, -1).astype(np.int32)

    host = vote_instance_classes(
        masks, np.asarray(color_distance_map(
            jnp.asarray(sem_png), pal, "abs")), num_things)
    dev = np.asarray(vote_fn(jnp.asarray(masks), jnp.asarray(sem_png)))
    np.testing.assert_array_equal(host, dev)


def test_pose_driver_perfect_predictions(tmp_path):
    pred_dir = tmp_path / "pred"
    pred_dir.mkdir()
    rng = np.random.RandomState(0)
    center = [96.0, 128.0]
    scale = [192 / 200.0, 256 / 200.0]

    kpts_img = np.zeros((17, 3), np.float32)
    kpts_img[:, 0] = rng.uniform(30, 160, 17)
    kpts_img[:, 1] = rng.uniform(30, 220, 17)
    kpts_img[:, 2] = 2
    crop_kpts = prep.keypoints_to_crop(kpts_img, np.asarray(center),
                                       np.asarray(scale))
    heat = prep.gaussian_heatmaps(crop_kpts, (256, 192), sigma=8.0)
    Image.fromarray(prep.paint_pose_crop(heat)).save(pred_dir / "c0.png")

    meta = [{"key": "c0", "image_id": 1, "center": center,
             "scale": scale, "bbox_score": 0.99}]
    (tmp_path / "meta.json").write_text(json.dumps(meta))
    gt = {"annotations": [{
        "image_id": 1, "num_keypoints": 17, "area": 192.0 * 256.0,
        "keypoints": np.concatenate(
            [kpts_img[:, :2], np.full((17, 1), 2)], -1).reshape(-1).tolist(),
    }]}
    (tmp_path / "gt.json").write_text(json.dumps(gt))

    args = run_pose.get_args_parser().parse_args([
        "--pred_dir", str(pred_dir), "--meta_json",
        str(tmp_path / "meta.json"), "--gt_json", str(tmp_path / "gt.json")])
    res = run_pose.evaluate(args)
    assert res["AP"] > 95.0, res


def test_profiling_utils():
    timer = StepTimer(sync_every=2)
    assert timer.step() is None
    rate = timer.step()
    assert rate is not None and rate > 0
    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1
