"""COCO keypoint evaluation: painted-heatmap decode + OKS AP.

Behavioral contract from ``eval/mmpose_custom/model/top_down.py:163-260``
and the offline test config
(``eval/mmpose_custom/configs/coco_256x192_test_offline.py:75-109``):
- painted 256x192 crops encode R = heatmap magnitude, (G, B) = keypoint
  class color (17 colors on a 5x5 lattice + black background);
- decode: classify each pixel by nearest (G, B) color (L1), heatmap_k =
  mask_k * R / 255;
- flip test: decode the *_flip crop, swap left/right channels, mirror
  horizontally, shift one pixel right (shift_heatmap=True), average;
- keypoints: mmpose 'default' post-process — per-joint argmax + 0.25 px
  shift toward the higher neighbor, mapped back to the original image
  through the bbox center/scale affine;
- scoring: mean visible-joint heatmap value x bbox score; OKS soft-NMS
  unavailable -> oks_nms with thr 0.9 (soft_nms=False in the config);
- metric: COCO keypoint AP over OKS thresholds .50:.05:.95 (implemented
  natively; pycocotools is not shipped in this environment).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from painter_tpu.ops.palette import pose_gb_palette

COCO_FLIP_PAIRS = ((1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12),
                   (13, 14), (15, 16))
COCO_KPT_SIGMAS = np.array([
    .026, .025, .025, .035, .035, .079, .079, .072, .072, .062, .062,
    .107, .107, .087, .087, .089, .089])


def decode_painted_heatmaps(images: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) painted crops in [0,255] -> (B, 17, H, W) heatmaps."""
    images = images.astype(np.float32)
    gb_colors = np.concatenate(
        [pose_gb_palette().astype(np.float32), np.zeros((1, 2), np.float32)])
    gb = images[..., 1:]  # (B, H, W, 2)
    dist = np.abs(gb[:, None] - gb_colors[None, :, None, None, :]).sum(-1)
    cls = dist.argmin(1)  # (B, H, W) in [0..17]
    r = images[..., 0]
    heatmaps = np.stack([(cls == k) * r for k in range(17)], axis=1)
    return heatmaps / 255.0


def flip_back(heatmaps: np.ndarray,
              flip_pairs=COCO_FLIP_PAIRS) -> np.ndarray:
    """mmpose flip_back: swap paired channels, mirror width."""
    out = heatmaps.copy()
    for a, b in flip_pairs:
        out[:, [a, b]] = out[:, [b, a]]
    return out[..., ::-1]


def merge_flip_test(heatmaps: np.ndarray, flipped_heatmaps: np.ndarray,
                    shift_heatmap: bool = True) -> np.ndarray:
    flipped = flip_back(flipped_heatmaps)
    if shift_heatmap:
        flipped[:, :, :, 1:] = flipped[:, :, :, :-1]
    return (heatmaps + flipped) / 2.0


def _taylor_default(heatmap: np.ndarray, px: int, py: int
                    ) -> Tuple[float, float]:
    """mmpose 'default' quarter-pixel shift toward the higher neighbor."""
    h, w = heatmap.shape
    dx = dy = 0.0
    if 1 < px < w - 1 and 0 < py < h:
        dx = 0.25 * np.sign(heatmap[py, px + 1] - heatmap[py, px - 1])
    if 1 < py < h - 1 and 0 < px < w:
        dy = 0.25 * np.sign(heatmap[py + 1, px] - heatmap[py - 1, px])
    return dx, dy


def keypoints_from_heatmaps(heatmaps: np.ndarray, centers: np.ndarray,
                            scales: np.ndarray
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """(B, K, H, W) -> keypoints (B, K, 2) in image coords + maxvals.

    mmpose top-down protocol: argmax + default post-process, then
    transform through the bbox affine: x_img = x * scale*200/size +
    center - scale*200/2."""
    b, k, h, w = heatmaps.shape
    coords = np.zeros((b, k, 2), np.float32)
    maxvals = np.zeros((b, k, 1), np.float32)
    for i in range(b):
        for j in range(k):
            hm = heatmaps[i, j]
            idx = hm.argmax()
            py, px = divmod(int(idx), w)
            val = hm[py, px]
            maxvals[i, j, 0] = val
            if val > 0:
                dx, dy = _taylor_default(hm, px, py)
                coords[i, j] = (px + dx, py + dy)
            else:
                coords[i, j] = (-1, -1)
    # transform to original coordinates
    out = np.zeros_like(coords)
    for i in range(b):
        scale = scales[i] * 200.0
        out[i, :, 0] = coords[i, :, 0] * scale[0] / w \
            + centers[i][0] - scale[0] * 0.5
        out[i, :, 1] = coords[i, :, 1] * scale[1] / h \
            + centers[i][1] - scale[1] * 0.5
    return out, maxvals


def compute_oks(pred: np.ndarray, gt: np.ndarray, gt_vis: np.ndarray,
                area: float, sigmas: np.ndarray = COCO_KPT_SIGMAS
                ) -> float:
    """OKS between one predicted and one GT pose (COCO protocol)."""
    vis = gt_vis > 0
    if not vis.any():
        return 0.0
    d2 = ((pred[:, :2] - gt[:, :2]) ** 2).sum(-1)
    var = (2 * sigmas) ** 2
    e = d2 / (2 * var * (area + np.spacing(1)))
    return float(np.exp(-e)[vis].mean())


def oks_nms(poses: List[Dict], thr: float = 0.9) -> List[Dict]:
    """Greedy OKS NMS over {keypoints (17,3), score, area} dicts."""
    if not poses:
        return poses
    order = np.argsort([-p["score"] for p in poses], kind="stable")
    keep = []
    suppressed = np.zeros(len(poses), bool)
    for ii in order:
        if suppressed[ii]:
            continue
        keep.append(poses[ii])
        for jj in order:
            if jj == ii or suppressed[jj]:
                continue
            oks = compute_oks(poses[jj]["keypoints"],
                              poses[ii]["keypoints"],
                              poses[ii]["keypoints"][:, 2],
                              poses[ii]["area"])
            if oks > thr:
                suppressed[jj] = True
    return keep


class KeypointAPEvaluator:
    """COCO keypoint AP (OKS .50:.05:.95), self-contained.

    Accumulates per-image detections/GTs; AP via COCOeval's 101-point
    interpolated precision, maxDets=20."""

    def __init__(self, oks_thrs: Optional[Sequence[float]] = None,
                 max_dets: int = 20):
        self.oks_thrs = (np.arange(0.5, 1.0, 0.05)
                         if oks_thrs is None else np.asarray(oks_thrs))
        self.max_dets = max_dets
        self._dets: List[Tuple[int, float, np.ndarray]] = []
        self._gts: Dict[int, List[Dict]] = {}
        self._img_counter = 0

    def add_image(self, detections: List[Dict], gts: List[Dict]) -> None:
        """detections: {keypoints (17,3), score}; gts: {keypoints (17,3),

        area}. keypoints[:, 2] is visibility for GTs."""
        img_id = self._img_counter
        self._img_counter += 1
        self._gts[img_id] = gts
        for d in sorted(detections, key=lambda d: -d["score"])[
                :self.max_dets]:
            self._dets.append((img_id, float(d["score"]),
                               np.asarray(d["keypoints"], np.float32)))

    def evaluate(self) -> Dict[str, float]:
        n_gt = sum(len([g for g in gts if (np.asarray(
            g["keypoints"])[:, 2] > 0).any()])
            for gts in self._gts.values())
        if n_gt == 0:
            return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0}
        dets = sorted(self._dets, key=lambda t: -t[1])
        aps = []
        ap_at = {}
        for thr in self.oks_thrs:
            matched: Dict[int, set] = {}
            tp = np.zeros(len(dets))
            fp = np.zeros(len(dets))
            for di, (img_id, score, kpts) in enumerate(dets):
                gts = self._gts.get(img_id, [])
                best, best_g = 0.0, -1
                for gi, g in enumerate(gts):
                    if gi in matched.get(img_id, set()):
                        continue
                    gk = np.asarray(g["keypoints"], np.float32)
                    if not (gk[:, 2] > 0).any():
                        continue
                    oks = compute_oks(kpts, gk, gk[:, 2], g["area"])
                    if oks > best:
                        best, best_g = oks, gi
                if best >= thr and best_g >= 0:
                    tp[di] = 1
                    matched.setdefault(img_id, set()).add(best_g)
                else:
                    fp[di] = 1
            ctp = np.cumsum(tp)
            cfp = np.cumsum(fp)
            recall = ctp / n_gt
            precision = ctp / np.maximum(ctp + cfp, 1e-12)
            # 101-point interpolation
            for i in range(len(precision) - 1, 0, -1):
                precision[i - 1] = max(precision[i - 1], precision[i])
            rec_thrs = np.linspace(0, 1, 101)
            idx = np.searchsorted(recall, rec_thrs, side="left")
            prec_at = np.array([precision[i] if i < len(precision) else 0.0
                                for i in idx])
            ap = float(prec_at.mean())
            aps.append(ap)
            ap_at[round(float(thr), 2)] = ap
        return {"AP": 100 * float(np.mean(aps)),
                "AP50": 100 * ap_at.get(0.5, 0.0),
                "AP75": 100 * ap_at.get(0.75, 0.0)}
