"""Class-agnostic instance decoding from position-coded colors.

Behavioral contract from
``eval/coco_panoptic/COCOCAInstSegEvaluatorCustom.py:252-354``
(threshold variant, the one used for the published PQ): for each of the
6400 position colors, candidate mask = pixels with mean-channel L1
distance < dist_thr; score = 1 - normalized mean in-mask distance
("maskness"); top-2000 by maskness, matrix NMS (gaussian, sigma 2),
top-100 by decayed score.

TPU-native: the per-color distance/threshold/maskness pass runs as one
jitted reduction over the full palette instead of the reference's chunked
GPU loop; the dynamic-size filtering stays host-side.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from painter_tpu.ops.nms import mask_matrix_nms
from painter_tpu.ops.palette import coco_instance_palette


@functools.partial(jax.jit, static_argnames=("dist_thr",))
def _candidate_stats(segm: jnp.ndarray, palette: jnp.ndarray,
                     dist_thr: float):
    """segm (H, W, 3) -> per-color (mask, num_pos, maskness_neg)."""
    # (K, H, W): mean-channel L1 distance to each palette color
    dist = jnp.abs(segm[None] - palette[:, None, None, :]).sum(-1) / 3.0
    mask = dist < dist_thr
    num_pos = mask.sum((1, 2))
    neg = (dist * mask).sum((1, 2)) / jnp.maximum(num_pos, 1)
    return mask, num_pos, neg


def decode_instances(segm: np.ndarray,
                     dist_thr_list: Sequence[float] = (19.0,),
                     topk_pre: int = 2000, max_num: int = 100,
                     keep_all: bool = False,
                     colors_per_chunk: int = 800) -> Dict[str, np.ndarray]:
    """(H, W, 3) painted prediction -> {'masks' (N,H,W), 'scores' (N,)}.

    The palette is processed in chunks of ``colors_per_chunk`` (the
    reference uses 800, COCOCAInstSegEvaluatorCustom.py:282): a full
    (6400, H, W) distance tensor would be ~7 GB at COCO image sizes.
    """
    full_palette = coco_instance_palette()[:-1].astype(np.float32)
    segm_j = jnp.asarray(segm, jnp.float32)

    masks_list: List[np.ndarray] = []
    neg_list: List[np.ndarray] = []
    for dist_thr in dist_thr_list:
        for start in range(0, len(full_palette), colors_per_chunk):
            chunk = jnp.asarray(
                full_palette[start:start + colors_per_chunk])
            mask, num_pos, neg = _candidate_stats(segm_j, chunk,
                                                  float(dist_thr))
            keep = np.asarray(num_pos) > 0
            if keep.any():
                masks_list.append(np.asarray(mask)[keep])
                neg_list.append(np.asarray(neg)[keep])

    h, w = segm.shape[:2]
    if not masks_list:
        return {"masks": np.zeros((1, h, w), np.float32),
                "scores": np.zeros(1, np.float32)}

    masks = np.concatenate(masks_list)
    neg = np.concatenate(neg_list)
    order = np.argsort(neg, kind="stable")[:topk_pre]
    masks = masks[order]
    neg = neg[order]
    scores = 1.0 - neg / max(float(neg.max()), 1.0)
    labels = np.ones(len(masks), np.int32)

    if keep_all:
        return {"masks": masks.astype(np.float32), "scores": scores}

    scores, labels, masks, _ = mask_matrix_nms(
        masks, labels, scores, filter_thr=-1, nms_pre=-1, max_num=max_num,
        kernel="gaussian", sigma=2.0)
    return {"masks": masks.astype(np.float32),
            "scores": scores.astype(np.float32)}


def decode_instances_minmax(segm: np.ndarray,
                            colors_per_chunk: int = 800
                            ) -> Dict[str, np.ndarray]:
    """Min-max decode variant (COCOCAInstSegEvaluatorCustom.py:172-250):

    every pixel is assigned its nearest palette color (sum-L1, including
    the background black entry); each occupied color becomes one mask;
    score = 1 - mean in-mask distance / max; masks decoded as background
    get class 0 ('bg class will be ignored in eval'), others class 1.
    Returns {'masks', 'scores', 'classes'}.
    """
    palette = coco_instance_palette().astype(np.float32)  # incl. bg last
    segm_j = jnp.asarray(segm, jnp.float32)
    h, w = segm.shape[:2]
    best_dist = np.full((h, w), np.inf, np.float32)
    best_idx = np.zeros((h, w), np.int32)
    for start in range(0, len(palette), colors_per_chunk):
        chunk = jnp.asarray(palette[start:start + colors_per_chunk])
        dist = np.asarray(_chunk_dist(segm_j, chunk))  # (K, H, W) sum-L1
        k_min = dist.argmin(0)
        d_min = np.take_along_axis(dist, k_min[None], 0)[0]
        upd = d_min < best_dist
        best_dist = np.where(upd, d_min, best_dist)
        best_idx = np.where(upd, k_min.astype(np.int32) + start, best_idx)

    masks, neg, classes = [], [], []
    for cat in np.unique(best_idx):
        mask = best_idx == cat
        masks.append(mask)
        neg.append(float(best_dist[mask].mean()))
        classes.append(0 if cat == len(palette) - 1 else 1)
    neg = np.asarray(neg, np.float32)
    scores = 1.0 - neg / max(float(neg.max()), 1.0)
    return {"masks": np.stack(masks).astype(np.float32),
            "scores": scores.astype(np.float32),
            "classes": np.asarray(classes, np.int32)}


@jax.jit
def _chunk_dist(segm: jnp.ndarray, palette: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) x (K, 3) -> (K, H, W) sum-L1 distances (minmax decode
    uses the raw channel sum, :203-205)."""
    return jnp.abs(segm[None] - palette[:, None, None, :]).sum(-1)
