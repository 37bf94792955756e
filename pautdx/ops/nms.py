"""Fixed-shape NMS for TPU — no dynamic shapes, jit/vmap-friendly.

The reference relies on torchvision/Ultralytics NMS; on TPU variable-length
outputs are replaced by a **fixed-size top-k + masked suppression** design
(SURVEY.md §7 hard parts): score-mask invalid slots instead of dropping
them. The suppression loop is a `lax.fori_loop` over the K top candidates
with a precomputed K x K IoU matrix — K is small (<=300) so the O(K^2)
matrix is one tiny fused XLA program.

``pautdx.ops.pallas_nms`` provides the Pallas kernel variant of the same
algorithm for the serving path.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def box_iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """(K, 4) xyxy -> (K, K) IoU."""
    a, b = boxes[:, None, :], boxes[None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)


@functools.partial(jax.jit, static_argnames=("top_k", "max_det", "class_aware"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, classes: jnp.ndarray,
        *, iou_threshold: float = 0.45, score_threshold: float = 0.25,
        top_k: int = 300, max_det: int = 100,
        class_aware: bool = True) -> Dict[str, jnp.ndarray]:
    """Single-image NMS.

    boxes (A, 4) xyxy; scores (A,); classes (A,) int. Returns fixed-size
    {"boxes" (max_det, 4), "scores", "classes", "valid"} where ``valid``
    masks real detections.
    """
    k = min(top_k, scores.shape[0])
    scores = jnp.where(scores >= score_threshold, scores, 0.0)
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = boxes[order]
    top_classes = classes[order]

    nms_boxes = top_boxes
    if class_aware:
        # separate classes by translating boxes apart per class. The
        # torchvision trick: offset by (max_coord + 1) per class id — a
        # fixed 1e5 stride loses sub-pixel precision in f32 for moderate
        # class ids (ulp(8.4e6) = 1 px) and flips near-threshold IoUs
        stride = jnp.max(jnp.abs(top_boxes)) + 1.0
        offset = top_classes.astype(jnp.float32)[:, None] * stride
        nms_boxes = top_boxes + offset
    iou = box_iou_matrix(nms_boxes)

    def body(i, keep):
        alive = keep[i] & (top_scores[i] > 0.0)
        suppress = (iou[i] > iou_threshold) & (jnp.arange(k) > i)
        return jnp.where(alive, keep & ~suppress, keep)

    keep = jax.lax.fori_loop(0, k, body, jnp.ones((k,), bool))
    keep = keep & (top_scores > 0.0)

    kept_scores = jnp.where(keep, top_scores, 0.0)
    final_scores, idx = jax.lax.top_k(kept_scores, max_det)
    valid = final_scores > 0.0
    return {
        "boxes": top_boxes[idx] * valid[:, None],
        "scores": final_scores,
        "classes": jnp.where(valid, top_classes[idx], -1),
        "valid": valid,
        "indices": order[idx],
    }


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                classes: jnp.ndarray, **kw) -> Dict[str, jnp.ndarray]:
    """vmapped NMS over the batch axis."""
    return jax.vmap(lambda b, s, c: nms(b, s, c, **kw))(boxes, scores, classes)


def dense_to_detections(decoded: Dict[str, jnp.ndarray],
                        **nms_kw) -> Dict[str, jnp.ndarray]:
    """YOLO dense decode dict -> batched final detections.

    Takes {"boxes" (B, A, 4), "scores" (B, A, nc)}; best class per anchor.
    """
    cls_scores = decoded["scores"]
    best_cls = jnp.argmax(cls_scores, axis=-1)
    best_score = jnp.max(cls_scores, axis=-1)
    return batched_nms(decoded["boxes"], best_score, best_cls, **nms_kw)
