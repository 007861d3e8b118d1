"""Fixed-size class-aware NMS, fully on device.

TPU-native replacement for the reference's host NMS in layout postprocess
(oar-ocr-core/src/processors/layout_postprocess.rs:743 apply_nms_with_merge)
and for the NMS baked into PaddleDetection ONNX exports that the reference
executes opaquely. XLA-friendly formulation: static shapes, O(K²) masked
suppression over the top-K candidates (K ≤ a few hundred for layout), no
data-dependent control flow.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def iou_matrix(boxes: jax.Array) -> jax.Array:
    """(K, 4) xyxy → (K, K) pairwise IoU."""
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.clip(x1 - x0, 0) * jnp.clip(y1 - y0, 0)
    ix0 = jnp.maximum(x0[:, None], x0[None, :])
    iy0 = jnp.maximum(y0[:, None], y0[None, :])
    ix1 = jnp.minimum(x1[:, None], x1[None, :])
    iy1 = jnp.minimum(y1[:, None], y1[None, :])
    inter = jnp.clip(ix1 - ix0, 0) * jnp.clip(iy1 - iy0, 0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@functools.partial(jax.jit, static_argnames=("max_det",))
def nms_fixed(boxes: jax.Array, scores: jax.Array, labels: jax.Array,
              *, iou_thresh: float, score_thresh: float, max_det: int
              ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Class-aware greedy NMS over K candidates.

    boxes (K,4) xyxy, scores (K,), labels (K,) int32. Returns
    (boxes (max_det,4), scores, labels, valid mask) sorted by score; slots
    beyond the kept count have valid=False and score=-1.

    Greedy semantics match sequential NMS: a box is kept iff no
    higher-scoring *kept* box of the same class overlaps it above
    ``iou_thresh``. Implemented as a masked scan over score rank.
    """

    k = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes = boxes[order]
    scores = scores[order]
    labels = labels[order]

    iou = iou_matrix(boxes)
    same = labels[:, None] == labels[None, :]
    overlap = (iou > iou_thresh) & same
    # strictly-lower-rank suppressors only
    rank = jnp.arange(k)
    upper = rank[None, :] < rank[:, None]
    suppress_candidates = overlap & upper          # (i, j): j may suppress i

    def body(keep, i):
        sup = jnp.any(suppress_candidates[i] & keep)
        keep = keep.at[i].set(jnp.logical_not(sup) & keep[i])
        return keep, None

    init_keep = scores > score_thresh
    keep, _ = jax.lax.scan(body, init_keep, rank)

    neg = jnp.where(keep, scores, -1.0)
    top = jnp.argsort(-neg)[:max_det]
    valid = keep[top] & (neg[top] > -1.0)
    out_boxes = jnp.where(valid[:, None], boxes[top], 0.0)
    out_scores = jnp.where(valid, scores[top], -1.0)
    out_labels = jnp.where(valid, labels[top], -1)
    return out_boxes, out_scores, out_labels, valid


@functools.partial(jax.jit, static_argnames=("k",))
def topk_candidates(cls_scores: jax.Array, boxes: jax.Array, *, k: int
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Flatten (A, C) class scores to top-k (score, label, box) candidates."""
    a, c = cls_scores.shape
    flat = cls_scores.reshape(-1)
    scores, idx = jax.lax.top_k(flat, k)
    anchor = idx // c
    label = (idx % c).astype(jnp.int32)
    return boxes[anchor], scores, label
