"""Instance decode, panoptic fusion + PQ, pose decode + OKS AP."""
import numpy as np
import pytest

from painter_tpu.evals.instseg import decode_instances
from painter_tpu.evals.panoptic import (PQStat, combine_semantic_and_instance,
                                        vote_instance_classes)
from painter_tpu.evals.pose import (KeypointAPEvaluator, compute_oks,
                                    decode_painted_heatmaps,
                                    keypoints_from_heatmaps, merge_flip_test,
                                    oks_nms)
from painter_tpu.ops.palette import coco_instance_palette, pose_gb_palette


def test_decode_instances_recovers_painted_blobs():
    pal = coco_instance_palette()
    img = np.zeros((64, 64, 3), np.float32)
    c1, c2 = pal[100].astype(np.float32), pal[4000].astype(np.float32)
    img[5:20, 5:20] = c1
    img[40:60, 30:60] = c2
    out = decode_instances(img, dist_thr_list=(19.0,), max_num=10)
    masks, scores = out["masks"], out["scores"]
    assert len(masks) >= 2
    # the two painted blobs must be among the top masks
    blob1 = np.zeros((64, 64), bool)
    blob1[5:20, 5:20] = True
    blob2 = np.zeros((64, 64), bool)
    blob2[40:60, 30:60] = True
    ious = []
    for blob in (blob1, blob2):
        iou = max(((m > 0) & blob).sum() / ((m > 0) | blob).sum()
                  for m in masks)
        ious.append(iou)
    assert min(ious) > 0.95, ious


def test_panoptic_fusion_and_pq_perfect_match():
    h, w = 40, 40
    semseg = np.full((h, w), 90, np.int64)  # stuff class 90
    masks = np.zeros((1, h, w), np.float32)
    masks[0, 5:20, 5:20] = 1
    scores = np.array([0.9], np.float32)
    classes = np.array([3], np.int32)
    pan, segs = combine_semantic_and_instance(
        masks, scores, classes, semseg, stuff_area_thresh=100)
    assert len(segs) == 2
    assert segs[0]["isthing"] and segs[0]["category_id"] == 3
    assert not segs[1]["isthing"] and segs[1]["category_id"] == 90
    # thing occupies its mask, stuff the rest
    assert (pan[5:20, 5:20] == segs[0]["id"]).all()

    stat = PQStat()
    stat.process_image(pan, segs, pan.copy(),
                       [dict(s) for s in segs])
    res = stat.evaluate()
    assert res["PQ"] == pytest.approx(100.0)
    assert res["PQ_th"] == pytest.approx(100.0)
    assert res["PQ_st"] == pytest.approx(100.0)


def test_panoptic_fusion_thresholds():
    h, w = 20, 20
    semseg = np.full((h, w), 90, np.int64)
    masks = np.ones((2, h, w), np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    classes = np.array([1, 2], np.int32)
    # second instance fully overlaps the first -> dropped (overlap > 0.5)
    pan, segs = combine_semantic_and_instance(
        masks, scores, classes, semseg, stuff_area_thresh=1e9)
    assert len(segs) == 1 and segs[0]["category_id"] == 1
    # low score dropped
    pan, segs = combine_semantic_and_instance(
        masks[:1], np.array([0.3], np.float32), classes[:1], semseg,
        stuff_area_thresh=1e9)
    assert len(segs) == 0


def test_vote_instance_classes():
    h, w, k = 10, 10, 80
    dist = np.full((h, w, k), 100.0, np.float32)
    dist[:5, :, 7] = 0.0   # top half closest to class 7
    dist[5:, :, 21] = 0.0  # bottom half to class 21
    masks = np.zeros((2, h, w), np.float32)
    masks[0, :5] = 1
    masks[1, 5:] = 1
    classes = vote_instance_classes(masks, dist)
    assert classes.tolist() == [7, 21]


def test_pose_decode_roundtrip():
    """Paint a synthetic heatmap crop, decode, extract keypoints."""
    pal = pose_gb_palette()
    h, w = 64, 48
    img = np.zeros((1, h, w, 3), np.float32)
    truth = {}
    for k in (0, 5, 16):
        cy, cx = 10 + k, 8 + k
        yy, xx = np.mgrid[0:h, 0:w]
        heat = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 8.0)
        region = heat > 0.1
        img[0, region, 0] = heat[region] * 255
        img[0, region, 1] = pal[k][0]
        img[0, region, 2] = pal[k][1]
        truth[k] = (cx, cy)
    hm = decode_painted_heatmaps(img)
    assert hm.shape == (1, 17, h, w)
    centers = np.array([[w / 2, h / 2]], np.float32)
    scales = np.array([[w / 200.0, h / 200.0]], np.float32)
    kpts, maxvals = keypoints_from_heatmaps(hm, centers, scales)
    for k, (cx, cy) in truth.items():
        assert maxvals[0, k, 0] > 0.5
        np.testing.assert_allclose(kpts[0, k], (cx, cy), atol=1.0)
    # undetected joints have ~zero response
    assert maxvals[0, 1, 0] < 0.2


def test_flip_test_merge():
    hm = np.random.RandomState(0).rand(1, 17, 8, 6).astype(np.float32)
    merged = merge_flip_test(hm, hm, shift_heatmap=False)
    # flipping twice with channel swap averages pairs
    assert merged.shape == hm.shape
    # symmetric input (constant) is a fixed point
    const = np.ones_like(hm)
    np.testing.assert_allclose(merge_flip_test(const, const), const)


def test_oks_and_ap():
    rng = np.random.RandomState(0)
    gt_k = np.zeros((17, 3), np.float32)
    gt_k[:, 0] = rng.uniform(50, 150, 17)
    gt_k[:, 1] = rng.uniform(50, 150, 17)
    gt_k[:, 2] = 2
    assert compute_oks(gt_k, gt_k, gt_k[:, 2], area=10000.0) == 1.0

    ev = KeypointAPEvaluator()
    # image 0: perfect detection; image 1: garbage detection
    ev.add_image([{"keypoints": gt_k, "score": 0.95}],
                 [{"keypoints": gt_k, "area": 10000.0}])
    bad = gt_k.copy()
    bad[:, :2] += 300
    ev.add_image([{"keypoints": bad, "score": 0.9}],
                 [{"keypoints": gt_k, "area": 10000.0}])
    res = ev.evaluate()
    assert 0 < res["AP"] < 100
    # one perfect TP of two GTs -> precision 1.0 up to recall 0.5:
    # 101-point AP = 51/101
    assert res["AP50"] == pytest.approx(100 * 51 / 101, abs=1e-6)

    # oks_nms suppresses duplicates
    poses = [{"keypoints": gt_k, "score": 0.9, "area": 10000.0},
             {"keypoints": gt_k, "score": 0.8, "area": 10000.0}]
    kept = oks_nms(poses, thr=0.9)
    assert len(kept) == 1
