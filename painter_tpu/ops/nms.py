"""Matrix NMS (SOLOv2) — vectorized JAX port of the reference's pure-torch

``Painter/util/matrix_nms.py:5-121``. Decay scores by pairwise mask IoU
with gaussian/linear kernels; no data-dependent shapes (masking instead of
filtering) so it jits cleanly; the final filter/top-k happens host-side in
the evaluator where dynamic sizes are fine.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("kernel",))
def matrix_nms_scores(masks: jnp.ndarray, labels: jnp.ndarray,
                      scores: jnp.ndarray,
                      kernel: str = "gaussian", sigma: float = 2.0,
                      mask_area: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Decayed scores, same order as input.

    masks: (N, H, W) binary; labels: (N,); scores: (N,).
    Equivalent to the reference with nms_pre/max_num disabled; callers
    sort/filter afterwards (matrix_nms.py:53-121).
    """
    n = masks.shape[0]
    if n == 0:
        return scores
    flat = masks.reshape(n, -1).astype(jnp.float32)
    if mask_area is None:
        mask_area = flat.sum(-1)
    # the reference operates on score-sorted masks; replicate via argsort
    order = jnp.argsort(-scores, stable=True)
    inv_order = jnp.argsort(order, stable=True)
    flat = flat[order]
    area = mask_area[order]
    lab = labels[order]
    sc = scores[order]

    inter = flat @ flat.T
    union = area[:, None] + area[None, :] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    triu = jnp.triu(jnp.ones((n, n), bool), k=1)
    iou = jnp.where(triu, iou, 0.0)
    label_match = jnp.where(triu, lab[:, None] == lab[None, :], False)
    decay_iou = jnp.where(label_match, iou, 0.0)

    compensate = jnp.max(decay_iou, axis=0)           # per column
    compensate = compensate[:, None]                  # expand over cols
    if kernel == "gaussian":
        decay = jnp.exp(-sigma * decay_iou ** 2) / \
            jnp.exp(-sigma * compensate ** 2)
        coeff = jnp.min(decay, axis=0)
    elif kernel == "linear":
        decay = (1.0 - decay_iou) / (1.0 - compensate)
        coeff = jnp.min(decay, axis=0)
    else:
        raise ValueError(kernel)
    return (sc * coeff)[inv_order]


def mask_matrix_nms(masks: np.ndarray, labels: np.ndarray,
                    scores: np.ndarray, filter_thr: float = -1,
                    nms_pre: int = -1, max_num: int = -1,
                    kernel: str = "gaussian", sigma: float = 2.0
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                               np.ndarray]:
    """Full reference-compatible driver: returns

    (scores, labels, masks, keep_inds) sorted by decayed score
    (matrix_nms.py:5-121). Host-side wrapper around the jitted decay."""
    masks = np.asarray(masks)
    labels = np.asarray(labels)
    scores = np.asarray(scores)
    if len(labels) == 0:
        return (np.zeros(0, np.float32), labels[:0],
                masks[:0], np.zeros(0, np.int64))
    order = np.argsort(-scores, kind="stable")
    if nms_pre > 0:
        order = order[:nms_pre]
    keep_inds = order
    decayed = np.asarray(matrix_nms_scores(
        jnp.asarray(masks[order]), jnp.asarray(labels[order]),
        jnp.asarray(scores[order]), kernel=kernel, sigma=sigma))
    if filter_thr > 0:
        keep = decayed >= filter_thr
        if not keep.any():
            return (np.zeros(0, np.float32), labels[:0], masks[:0],
                    np.zeros(0, np.int64))
        keep_inds = keep_inds[keep]
        decayed = decayed[keep]
    order2 = np.argsort(-decayed, kind="stable")
    if max_num > 0:
        order2 = order2[:max_num]
    keep_inds = keep_inds[order2]
    return (decayed[order2], labels[keep_inds], masks[keep_inds],
            keep_inds)
