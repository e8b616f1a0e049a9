"""Native COCO segm AP / soft-NMS / min-max decode unit tests."""
import numpy as np
import pytest

from painter_tpu.evals.coco_ap import (InstanceAPEvaluator, classwise_nms,
                                       mask_iou_matrix, masks_to_boxes,
                                       soft_nms)


def _mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_mask_iou_crowd_rule():
    a = _mask(20, 20, 0, 10, 0, 10)       # 100 px
    b = _mask(20, 20, 0, 10, 5, 15)       # overlap 50
    iou = mask_iou_matrix(np.stack([a]), np.stack([b]), [False])
    assert iou[0, 0] == pytest.approx(50 / 150)
    # crowd: intersection / det area
    iou_c = mask_iou_matrix(np.stack([a]), np.stack([b]), [True])
    assert iou_c[0, 0] == pytest.approx(50 / 100)


def test_soft_nms_linear_decay():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    dets, keep = soft_nms(boxes, scores, iou_threshold=0.3,
                          method="linear", min_score=0.0)
    assert keep[0] == 0 and 2 in keep
    # the overlapping box survives with a decayed score 0.8*(1-iou)
    i = list(keep).index(1)
    x0, y0 = 1, 1
    inter = 9 * 9
    iou = inter / (100 + 100 - inter)
    assert dets[i, -1] == pytest.approx(0.8 * (1 - iou), abs=1e-5)
    # the far box keeps its score
    j = list(keep).index(2)
    assert dets[j, -1] == pytest.approx(0.7)


def test_masks_to_boxes():
    m = _mask(12, 16, 2, 7, 3, 9)
    np.testing.assert_array_equal(masks_to_boxes(m[None])[0], [3, 2, 9, 7])


def test_classwise_nms_separates_classes():
    a = _mask(20, 20, 0, 10, 0, 10)
    masks = np.stack([a, a]).astype(np.float32)
    labels = np.array([1, 2], np.int32)   # same mask, different classes
    scores = np.array([0.9, 0.8], np.float32)
    for nms_type in ("matrix", "soft"):
        m2, l2, s2 = classwise_nms(masks, labels, scores, nms_type, 0.6)
        # different classes: neither suppressed (soft) / barely decayed
        assert len(s2) == 2
        assert s2.min() > 0.5, (nms_type, s2)


def test_instance_ap_perfect_and_miss():
    gt_a = _mask(32, 32, 2, 12, 2, 12)
    gt_b = _mask(32, 32, 18, 30, 18, 30)
    ev = InstanceAPEvaluator()
    ev.add_image(
        [{"mask": gt_a, "score": 0.9, "category": 3}],
        [{"mask": gt_a, "category": 3},
         {"mask": gt_b, "category": 5}])   # category 5 missed entirely
    res = ev.evaluate()
    # per-category mean: cat3 AP=100, cat5 AP=0 -> 50
    assert res["AP"] == pytest.approx(50.0)
    assert res["AP50"] == pytest.approx(50.0)


def test_instance_ap_crowd_ignored():
    gt = _mask(32, 32, 2, 12, 2, 12)
    crowd = _mask(32, 32, 16, 30, 16, 30)
    ev = InstanceAPEvaluator()
    ev.add_image(
        [{"mask": gt, "score": 0.95, "category": 1},
         {"mask": crowd, "score": 0.99, "category": 1}],  # inside crowd
        [{"mask": gt, "category": 1},
         {"mask": crowd, "category": 1, "iscrowd": 1}])
    res = ev.evaluate()
    # the crowd-matched det is ignored, not an FP ahead of the TP
    assert res["AP"] == pytest.approx(100.0)


def test_instance_ap_area_ranges():
    small = _mask(64, 64, 0, 10, 0, 10)          # 100 px < 32^2
    large = _mask(256, 256, 0, 128, 0, 128)      # 16384 px > 96^2
    ev = InstanceAPEvaluator()
    ev.add_image([{"mask": small, "score": 0.9, "category": 1}],
                 [{"mask": small, "category": 1}])
    ev.add_image([{"mask": large, "score": 0.9, "category": 1}],
                 [{"mask": large, "category": 1}])
    res = ev.evaluate()
    assert res["AP_small"] == pytest.approx(100.0)
    assert res["AP_large"] == pytest.approx(100.0)
    assert res["AP_medium"] <= 0.0  # no medium GT -> -1 sentinel


def test_decode_instances_minmax_roundtrip():
    from painter_tpu.data.prep import paint_instances
    from painter_tpu.evals.instseg import decode_instances_minmax
    h, w = 64, 64
    masks = np.zeros((2, h, w), np.float32)
    masks[0, 4:20, 6:30] = 1
    masks[1, 36:60, 30:60] = 1
    painted = paint_instances(masks, (h, w))
    out = decode_instances_minmax(painted.astype(np.float32))
    fg = out["classes"] == 1
    assert fg.sum() == 2 and (~fg).sum() == 1  # 2 instances + bg
    # each GT mask is recovered exactly by some decoded mask
    for gt in masks:
        ious = [(m.astype(bool) & gt.astype(bool)).sum()
                / max((m.astype(bool) | gt.astype(bool)).sum(), 1)
                for m in out["masks"][fg]]
        assert max(ious) == pytest.approx(1.0)
    assert out["scores"].max() <= 1.0
