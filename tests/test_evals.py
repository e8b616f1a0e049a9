"""Evaluators: palettes, decode round-trip, matrix NMS vs torch oracle,
mIoU/depth/PSNR/SSIM golden values."""
import numpy as np
import pytest
import torch

from painter_tpu.evals.depth import DepthEvaluator, compute_errors
from painter_tpu.evals.restoration import psnr, ssim
from painter_tpu.evals.semseg import SemSegEvaluator
from painter_tpu.ops.nms import mask_matrix_nms
from painter_tpu.ops.palette import (ade20k_palette, coco_instance_palette,
                                     coco_semseg_palette,
                                     nearest_color_decode, paint_semantic,
                                     pose_gb_palette)

RNG = np.random.RandomState(0)


def test_palettes_are_unique_and_sized():
    assert ade20k_palette().shape == (150, 3)
    assert coco_semseg_palette().shape == (133, 3)
    assert coco_instance_palette().shape == (6400, 3)
    assert pose_gb_palette().shape == (17, 2)
    for pal in (ade20k_palette(), coco_semseg_palette(),
                coco_instance_palette()):
        assert len({tuple(c) for c in pal.tolist()}) == len(pal)


def test_palette_reference_values():
    """Golden first/last colors from the reference formulas."""
    pal = ade20k_palette()  # nsep=6, sep=42
    assert tuple(pal[0]) == (255, 255, 255)
    assert tuple(pal[1]) == (255, 255, 213)
    assert tuple(pal[149]) == (255 - 4 * 42, 255, 255 - 5 * 42)
    pal = coco_semseg_palette()  # channelsep=7, sep=36
    assert tuple(pal[0]) == (255, 255, 255)
    assert tuple(pal[132]) == (255 - 2 * 36, 255 - 4 * 36, 255 - 6 * 36)
    pal = coco_instance_palette()  # sep_r=15, sep_gb=13
    assert tuple(pal[0]) == (255, 255, 255)
    assert tuple(pal[1]) == (255, 255, 242)
    assert tuple(pal[-1]) == (255 - 15 * 15, 255 - 19 * 13, 255 - 19 * 13)


def test_encode_decode_roundtrip_with_noise():
    pal = ade20k_palette()
    labels = RNG.randint(0, 150, size=(31, 17))
    painted = paint_semantic(labels, pal).astype(np.float32)
    noisy = painted + RNG.uniform(-15, 15, painted.shape)
    decoded = np.asarray(nearest_color_decode(noisy, pal))
    assert (decoded == labels).mean() > 0.99


def test_matrix_nms_matches_torch_reference():
    """Oracle: the decay math from util/matrix_nms.py re-run in torch."""
    n, h, w = 12, 16, 16
    masks = (RNG.rand(n, h, w) > 0.6).astype(np.float32)
    labels = RNG.randint(0, 3, n)
    scores = RNG.rand(n).astype(np.float32)

    def torch_oracle(kernel, sigma=2.0):
        m = torch.from_numpy(masks)
        lb = torch.from_numpy(labels)
        sc = torch.from_numpy(scores)
        area = m.sum((1, 2)).float()
        sc_s, sort_inds = torch.sort(sc, descending=True)
        m_s = m[sort_inds]
        area_s = area[sort_inds]
        lb_s = lb[sort_inds]
        flat = m_s.reshape(n, -1)
        inter = flat @ flat.T
        exp_area = area_s.expand(n, n)
        iou = (inter / (exp_area + exp_area.T - inter)).triu(diagonal=1)
        lm = (lb_s.expand(n, n) == lb_s.expand(n, n).T).triu(diagonal=1)
        comp, _ = (iou * lm).max(0)
        comp = comp.expand(n, n).T
        decay_iou = iou * lm
        if kernel == "gaussian":
            dm = torch.exp(-sigma * decay_iou ** 2) / \
                torch.exp(-sigma * comp ** 2)
        else:
            dm = (1 - decay_iou) / (1 - comp)
        coeff, _ = dm.min(0)
        out_scores = sc_s * coeff
        return out_scores.numpy(), sort_inds.numpy()

    for kernel in ("gaussian", "linear"):
        ref_scores, sort_inds = torch_oracle(kernel)
        got_scores, got_labels, got_masks, keep = mask_matrix_nms(
            masks, labels, scores, kernel=kernel)
        # our driver returns score-desc order; oracle scores are in
        # pre-decay score order -> compare sorted
        np.testing.assert_allclose(np.sort(got_scores)[::-1],
                                   np.sort(ref_scores)[::-1], atol=1e-5)
    # filter_thr + max_num behavior
    s2, l2, m2, k2 = mask_matrix_nms(masks, labels, scores,
                                     filter_thr=0.5, max_num=3)
    assert (s2 >= 0.5).all() and len(s2) <= 3


def test_miou_golden():
    pal = np.array([[255, 255, 255], [0, 0, 0], [128, 0, 0]], np.uint8)
    ev = SemSegEvaluator(num_classes=3, palette=pal)
    gt = np.array([[0, 0], [1, 2]])
    painted = pal[np.array([[0, 1], [1, 2]])].astype(np.float32)
    ev.process(painted, gt)
    res = ev.evaluate()
    # class0: tp1 gt2 pred1 -> iou 1/2; class1: tp1 gt1 pred2 -> 1/2;
    # class2: tp1 gt1 pred1 -> 1
    np.testing.assert_allclose(res["mIoU"], 100 * (0.5 + 0.5 + 1) / 3,
                               rtol=1e-6)
    np.testing.assert_allclose(res["pACC"], 75.0, rtol=1e-6)


def test_miou_ignore_label():
    pal = np.array([[255, 255, 255], [0, 0, 0]], np.uint8)
    ev = SemSegEvaluator(num_classes=2, palette=pal, ignore_label=255)
    gt = np.array([[0, 255], [255, 255]])
    painted = pal[np.array([[0, 1], [1, 1]])].astype(np.float32)
    ev.process(painted, gt)
    res = ev.evaluate()
    np.testing.assert_allclose(res["mIoU"], 100.0)  # only class0 counted


def test_depth_metrics_golden():
    gt = np.full((480, 640), 2.0)
    pred = np.full((480, 640), 2.2)
    ev = DepthEvaluator(eigen_crop=True)
    ev.process(pred, gt)
    res = ev.evaluate()
    np.testing.assert_allclose(res["rmse"], 0.2, atol=1e-9)
    np.testing.assert_allclose(res["abs_rel"], 0.1, atol=1e-9)
    assert res["d1"] == 1.0
    # identical -> zero error
    ev2 = DepthEvaluator()
    ev2.process(gt, gt)
    assert ev2.evaluate()["rmse"] == 0.0


def test_psnr_ssim_golden():
    a = RNG.rand(64, 64, 3)
    assert psnr(a, a) > 100
    np.testing.assert_allclose(ssim(a, a), 1.0, atol=1e-9)
    noisy = np.clip(a + RNG.randn(64, 64, 3) * 0.1, 0, 1)
    p = psnr(noisy, a)
    assert 15 < p < 25  # sigma 0.1 -> ~20 dB
    s = ssim(noisy, a)
    assert 0.2 < s < 0.95
