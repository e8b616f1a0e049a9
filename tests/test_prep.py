"""Dataset prep: paint->decode round-trips across all codecs."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from painter_tpu.data import prep
from painter_tpu.evals.instseg import decode_instances
from painter_tpu.evals.pose import decode_painted_heatmaps
from painter_tpu.evals.semseg import SemSegEvaluator
from painter_tpu.ops.palette import ade20k_palette


def test_semantic_paint_decode_roundtrip(tmp_path):
    labels = np.random.RandomState(0).randint(1, 151, (40, 30))
    labels[:5] = 0  # ADE ignore
    ldir = tmp_path / "labels"
    ldir.mkdir()
    Image.fromarray(labels.astype(np.uint8)).save(ldir / "a.png")
    outs = prep.paint_semantic_dir(str(ldir), str(tmp_path / "color"),
                                   task="ade20k")
    painted = np.asarray(Image.open(outs[0]), np.float32)
    ev = SemSegEvaluator(150, ade20k_palette())
    decoded = ev.decode(painted)
    np.testing.assert_array_equal(decoded[5:], labels[5:] - 1)
    # ignore region painted black
    assert (painted[:5] == 0).all()


def test_panoptic_to_semantic():
    png = np.zeros((10, 10, 3), np.uint8)
    png[:5] = (1, 0, 0)      # id 1
    png[5:] = (0, 1, 0)      # id 256
    segs = [{"id": 1, "category_id": 7}, {"id": 256, "category_id": 90}]
    cat_map = {7: 0, 90: 1}
    sem = prep.semantic_from_panoptic(png, segs, cat_map)
    assert (sem[:5] == 0).all() and (sem[5:] == 1).all()


def test_instance_paint_decode_roundtrip():
    h, w = 96, 96
    masks = np.zeros((2, h, w), np.float32)
    masks[0, 10:30, 10:30] = 1
    masks[1, 60:90, 50:90] = 1
    painted = prep.paint_instances(masks, (h, w)).astype(np.float32)
    out = decode_instances(painted, dist_thr_list=(19.0,), max_num=10)
    ious = []
    for gt in masks:
        iou = max((((m > 0) & (gt > 0)).sum() /
                   max(((m > 0) | (gt > 0)).sum(), 1))
                  for m in out["masks"])
        ious.append(iou)
    assert min(ious) > 0.95, ious


def test_pose_paint_decode_roundtrip():
    kpts = np.zeros((17, 3), np.float32)
    kpts[3] = (50, 80, 2)
    kpts[10] = (120, 200, 2)
    maps = prep.gaussian_heatmaps(kpts, (256, 192), sigma=8.0)
    painted = prep.paint_pose_crop(maps)
    heat = decode_painted_heatmaps(painted[None].astype(np.float32))
    for k in (3, 10):
        y, x = np.unravel_index(heat[0, k].argmax(), heat[0, k].shape)
        np.testing.assert_allclose((x, y), kpts[k, :2], atol=1.5)
    assert heat[0, 0].max() < 0.1  # invisible joint empty


def test_crop_person_and_keypoint_transform():
    img = (np.random.RandomState(0).rand(480, 640, 3) * 255).astype(
        np.uint8)
    bbox = (100, 80, 160, 320)  # x, y, w, h
    crop, center, scale = prep.crop_person(img, bbox)
    assert crop.shape == (256, 192, 3)
    np.testing.assert_allclose(center, (180, 240))
    kpts = np.array([[180, 240, 2]], np.float32)  # at the center
    ck = prep.keypoints_to_crop(kpts, center, scale)
    np.testing.assert_allclose(ck[0, :2], (96, 128), atol=0.5)
    # round-trip through evals transform (keypoints_from_heatmaps math)
    src_w, src_h = scale * 200
    back_x = ck[0, 0] * src_w / 192 + center[0] - src_w / 2
    back_y = ck[0, 1] * src_h / 256 + center[1] - src_h / 2
    np.testing.assert_allclose((back_x, back_y), (180, 240), atol=0.5)


def test_gen_json_and_toy_dataset(tmp_path):
    root = tmp_path
    (root / "imgs").mkdir()
    (root / "tgts").mkdir()
    for i in range(5):
        arr = np.zeros((8, 8, 3), np.uint8)
        Image.fromarray(arr).save(root / "imgs" / f"x{i}.png")
        Image.fromarray(arr).save(root / "tgts" / f"x{i}.png")
    out_json = str(root / "pairs.json")
    n = prep.gen_pair_json(str(root / "imgs"), str(root / "tgts"),
                           "derain_image2derain", out_json, root=str(root))
    assert n == 5
    pairs = json.load(open(out_json))
    assert pairs[0]["type"] == "derain_image2derain"
    assert not os.path.isabs(pairs[0]["image_path"])

    toy = prep.make_toy_dataset([out_json], str(root / "toy"), str(root),
                                samples_per_task=2)
    toy_pairs = json.load(open(toy[0]))
    assert len(toy_pairs) == 2
    assert os.path.exists(os.path.join(root, "toy",
                                       toy_pairs[0]["image_path"]))


def test_make_pose_eval_crops(tmp_path):
    rng = np.random.RandomState(0)
    imd = tmp_path / "imgs"
    imd.mkdir()
    Image.fromarray((rng.rand(480, 640, 3) * 255).astype(np.uint8)).save(
        imd / "000001.jpg")
    (tmp_path / "coco.json").write_text(json.dumps(
        {"images": [{"id": 1, "file_name": "000001.jpg"}]}))
    (tmp_path / "dets.json").write_text(json.dumps([
        {"image_id": 1, "category_id": 1, "bbox": [100, 80, 120, 300],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [300, 100, 100, 250],
         "score": 0.02},
    ]))
    meta_path = prep.make_pose_eval_crops(
        str(imd), str(tmp_path / "dets.json"), str(tmp_path / "coco.json"),
        str(tmp_path / "crops"), det_bbox_thr=0.1)
    metas = json.load(open(meta_path))
    assert len(metas) == 1  # low-score box filtered
    key = metas[0]["key"]
    crop = np.asarray(Image.open(tmp_path / "crops" / f"{key}.png"))
    flip = np.asarray(Image.open(tmp_path / "crops" / f"{key}_flip.png"))
    assert crop.shape == (256, 192, 3)
    np.testing.assert_array_equal(flip, crop[:, ::-1])
    assert metas[0]["bbox_score"] == 0.9


def test_semantic_from_panoptic_dir(tmp_path):
    import json
    from PIL import Image
    pan_root = tmp_path / "pan"
    pan_root.mkdir()
    png = np.zeros((8, 8, 3), np.uint8)
    png[:4] = (1, 0, 0)    # id 1
    png[4:] = (2, 0, 0)    # id 2
    Image.fromarray(png).save(pan_root / "000001.png")
    pan_json = tmp_path / "panoptic.json"
    pan_json.write_text(json.dumps({
        "categories": [{"id": 7, "isthing": 1}, {"id": 90, "isthing": 0}],
        "annotations": [{
            "file_name": "000001.png",
            "segments_info": [{"id": 1, "category_id": 90},
                              {"id": 2, "category_id": 7}],
        }],
    }))
    outs = prep.semantic_from_panoptic_dir(str(pan_json), str(pan_root),
                                           str(tmp_path / "sem"))
    assert len(outs) == 1
    sem = np.asarray(Image.open(outs[0]))
    # category 90 is contiguous index 1, category 7 index 0
    assert (sem[:4] == 1).all() and (sem[4:] == 0).all()
