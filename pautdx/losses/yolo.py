"""YOLO training criterion: task-aligned assigner + CIoU + DFL + BCE.

The capability the reference gets from Ultralytics' internal trainer
(SURVEY.md §2.1 dependency note). Fully static-shape: ground truths are
padded to ``max_boxes`` per image and the assigner is dense (A anchors x M
gts) — one fused XLA program, no host loops.

Segment variant adds prototype-mask BCE on assigned anchors.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pautdx.models.vision.yolo import (
    YoloConfig, anchor_points, assemble_masks, decode_boxes,
)


def pairwise_iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(A, 4) x (M, 4) -> (A, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def ciou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise complete IoU between aligned (..., 4) boxes."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    wa = jnp.clip(a[..., 2] - a[..., 0], 1e-9)
    ha = jnp.clip(a[..., 3] - a[..., 1], 1e-9)
    wb = jnp.clip(b[..., 2] - b[..., 0], 1e-9)
    hb = jnp.clip(b[..., 3] - b[..., 1], 1e-9)
    union = wa * ha + wb * hb - inter
    iou = inter / jnp.maximum(union, 1e-9)
    # enclosing box diagonal
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    ewh = erb - elt
    c2 = jnp.sum(jnp.square(ewh), axis=-1) + 1e-9
    ca = 0.5 * (a[..., :2] + a[..., 2:])
    cb = 0.5 * (b[..., :2] + b[..., 2:])
    rho2 = jnp.sum(jnp.square(ca - cb), axis=-1)
    v = (4 / jnp.pi ** 2) * jnp.square(
        jnp.arctan(wb / hb) - jnp.arctan(wa / ha))
    alpha = v / jnp.maximum(1.0 - iou + v, 1e-9)
    return iou - rho2 / c2 - alpha * v


def task_aligned_assign(cls_probs: jnp.ndarray, pred_boxes: jnp.ndarray,
                        gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                        gt_mask: jnp.ndarray, anchor_pts: jnp.ndarray,
                        topk: int = 10, alpha: float = 0.5, beta: float = 6.0
                        ) -> Dict[str, jnp.ndarray]:
    """Single-image TAL. Returns per-anchor assignment:
    {"target_scores" (A, nc), "target_boxes" (A, 4), "fg" (A,),
     "target_gt_idx" (A,)}."""
    A = pred_boxes.shape[0]
    M = gt_boxes.shape[0]
    iou = pairwise_iou_xyxy(pred_boxes, gt_boxes)                  # (A, M)
    cls_at_gt = jnp.take_along_axis(
        cls_probs, jnp.clip(gt_classes, 0)[None, :].repeat(A, 0), axis=-1)
    metric = (cls_at_gt ** alpha) * (iou ** beta)
    inside = ((anchor_pts[:, None, 0] >= gt_boxes[None, :, 0])
              & (anchor_pts[:, None, 0] < gt_boxes[None, :, 2])
              & (anchor_pts[:, None, 1] >= gt_boxes[None, :, 1])
              & (anchor_pts[:, None, 1] < gt_boxes[None, :, 3]))
    valid = inside & (gt_mask[None, :] > 0)
    metric = jnp.where(valid, metric, 0.0)

    # top-k anchors per gt
    k = min(topk, A)
    topk_metric, topk_idx = jax.lax.top_k(metric.T, k)             # (M, k)
    cand = jnp.zeros((M, A), bool).at[
        jnp.arange(M)[:, None], topk_idx].set(topk_metric > 0)
    cand = cand.T & valid                                          # (A, M)

    # conflicts: anchor claimed by several gts -> highest IoU wins
    iou_masked = jnp.where(cand, iou, -1.0)
    best_gt = jnp.argmax(iou_masked, axis=-1)                      # (A,)
    fg = jnp.max(iou_masked, axis=-1) > 0.0

    tgt_boxes = gt_boxes[best_gt]
    tgt_cls = jnp.clip(gt_classes[best_gt], 0)
    # normalized target score (align metric scaled by per-gt max IoU)
    pos_metric = jnp.where(cand, metric, 0.0)
    per_gt_max_metric = jnp.max(pos_metric, axis=0)                # (M,)
    per_gt_max_iou = jnp.max(jnp.where(cand, iou, 0.0), axis=0)
    norm = per_gt_max_iou / jnp.maximum(per_gt_max_metric, 1e-9)
    anchor_metric = jnp.take_along_axis(
        pos_metric, best_gt[:, None], axis=-1)[:, 0]
    score = anchor_metric * norm[best_gt]
    nc = cls_probs.shape[-1]
    target_scores = jnp.zeros((A, nc)).at[
        jnp.arange(A), tgt_cls].set(jnp.where(fg, score, 0.0))
    return {"target_scores": target_scores, "target_boxes": tgt_boxes,
            "fg": fg.astype(jnp.float32), "target_gt_idx": best_gt}


def _dfl_loss(box_logits: jnp.ndarray, target_ltrb: jnp.ndarray,
              reg_max: int) -> jnp.ndarray:
    """Distribution focal loss: CE to the two integer bins around target.

    box_logits (..., 4*reg_max); target_ltrb (..., 4) in stride units.
    Returns (...,) per-anchor loss (mean over 4 sides).
    """
    t = jnp.clip(target_ltrb, 0.0, reg_max - 1.001)
    tl = jnp.floor(t)
    wr = t - tl
    wl = 1.0 - wr
    logits = box_logits.reshape(box_logits.shape[:-1] + (4, reg_max))
    logz = jax.nn.logsumexp(logits, axis=-1)
    il = tl.astype(jnp.int32)
    ll = jnp.take_along_axis(logits, il[..., None], axis=-1)[..., 0]
    lr = jnp.take_along_axis(
        logits, jnp.minimum(il + 1, reg_max - 1)[..., None], axis=-1)[..., 0]
    ce = wl * (logz - ll) + wr * (logz - lr)
    return ce.mean(axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "img_size"))
def yolo_loss(result: Dict, gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
              gt_mask: jnp.ndarray, cfg: YoloConfig,
              img_size: Tuple[int, int] = (320, 320),
              gt_masks: Optional[jnp.ndarray] = None,
              box_w: float = 7.5, cls_w: float = 0.5, dfl_w: float = 1.5,
              seg_w: float = 1.0) -> Tuple[jnp.ndarray, Dict]:
    """Batched YOLO training loss.

    gt_boxes (B, M, 4) xyxy px (padded); gt_classes (B, M); gt_mask (B, M);
    gt_masks (B, M, Hp, Wp) binary at proto resolution when cfg.seg.
    """
    decoded = decode_boxes(result, img_size, cfg)
    pts, strs = decoded["anchor_points"], decoded["anchor_strides"]
    cls_logits = jnp.concatenate(
        [lvl["cls"].reshape(lvl["cls"].shape[0], -1, cfg.num_classes)
         for lvl in result["levels"]], axis=1)
    box_logits = jnp.concatenate(
        [lvl["box"].reshape(lvl["box"].shape[0], -1, 4 * cfg.reg_max)
         for lvl in result["levels"]], axis=1)

    # assignment sees DETACHED predictions (Ultralytics:
    # pd_scores.detach().sigmoid(), pd_bboxes.detach()): targets,
    # per-anchor weights, and score_sum are constants w.r.t. the
    # params — otherwise the optimizer can lower the loss by shrinking
    # its own targets/weights instead of improving predictions
    assign = jax.vmap(
        lambda cp, pb, gb, gc, gm: task_aligned_assign(cp, pb, gb, gc, gm, pts)
    )(jax.lax.stop_gradient(decoded["scores"]),
      jax.lax.stop_gradient(decoded["boxes"]), gt_boxes, gt_classes, gt_mask)

    tgt_scores = assign["target_scores"]
    fg = assign["fg"]
    score_sum = jnp.maximum(tgt_scores.sum(), 1.0)

    # cls BCE with soft targets over all anchors
    logz = jnp.log1p(jnp.exp(-jnp.abs(cls_logits))) + jnp.maximum(-cls_logits, 0)
    bce = tgt_scores * logz + (1 - tgt_scores) * (logz + cls_logits)
    loss_cls = bce.sum() / score_sum

    # box CIoU on foreground, weighted by target score
    w = tgt_scores.sum(-1)                                  # (B, A)
    ciou = ciou_xyxy(decoded["boxes"], assign["target_boxes"])
    loss_box = jnp.sum((1.0 - ciou) * w * fg) / score_sum

    # DFL to target ltrb in stride units
    tb = assign["target_boxes"]
    ltrb = jnp.concatenate([
        (pts[None, :, 0:1] - tb[..., 0:1]), (pts[None, :, 1:2] - tb[..., 1:2]),
        (tb[..., 2:3] - pts[None, :, 0:1]), (tb[..., 3:4] - pts[None, :, 1:2]),
    ], axis=-1) / strs[None, :, None]
    dfl = _dfl_loss(box_logits, ltrb, cfg.reg_max)
    loss_dfl = jnp.sum(dfl * w * fg) / score_sum

    total = box_w * loss_box + cls_w * loss_cls + dfl_w * loss_dfl
    aux = {"box": loss_box, "cls": loss_cls, "dfl": loss_dfl}

    if cfg.seg and gt_masks is not None:
        # Ultralytics-style mask loss, fg-only: TAL selects <= topk(10)
        # anchors per gt, so gathering the top 10*M weighted anchors is
        # exact (dropped anchors have w*fg == 0) and avoids materializing
        # (B, A, Hp, Wp) over ALL ~8400 anchors (~860 MB/image at 640px).
        # BCE is cropped to the target box and normalized by its area at
        # proto resolution (`ultralytics loss.py single_mask_loss`).
        coeffs = decoded["coeffs"]                           # (B, A, P)
        protos = result["protos"]                            # (B, Hp, Wp, P)
        A = fg.shape[1]
        k = min(10 * gt_boxes.shape[1], A)
        sel_w, sel_idx = jax.lax.top_k(w * fg, k)            # (B, k)
        sel_coeffs = jnp.take_along_axis(
            coeffs, sel_idx[..., None], axis=1)              # (B, k, P)
        pred_m = jnp.einsum("bhwp,bkp->bkhw", protos, sel_coeffs)
        gt_idx = jnp.take_along_axis(assign["target_gt_idx"], sel_idx,
                                     axis=1)
        tgt_m = jnp.take_along_axis(
            gt_masks, gt_idx[..., None, None], axis=1)       # (B, k, Hp, Wp)
        tgt_b = jnp.take_along_axis(
            assign["target_boxes"], sel_idx[..., None], axis=1)
        Hp, Wp = protos.shape[1:3]
        sx, sy = Wp / img_size[1], Hp / img_size[0]
        x0, y0 = tgt_b[..., 0] * sx, tgt_b[..., 1] * sy      # (B, k)
        x1, y1 = tgt_b[..., 2] * sx, tgt_b[..., 3] * sy
        xs = jnp.arange(Wp, dtype=jnp.float32)[None, None, None, :]
        ys = jnp.arange(Hp, dtype=jnp.float32)[None, None, :, None]
        crop = ((xs >= x0[..., None, None]) & (xs < x1[..., None, None])
                & (ys >= y0[..., None, None]) & (ys < y1[..., None, None]))
        area = jnp.maximum((x1 - x0) * (y1 - y0), 1.0)       # (B, k)
        mlogz = jnp.log1p(jnp.exp(-jnp.abs(pred_m))) + jnp.maximum(-pred_m, 0)
        mbce = tgt_m * mlogz + (1 - tgt_m) * (mlogz + pred_m)
        per_anchor = jnp.sum(mbce * crop, axis=(-1, -2)) / area
        loss_seg = jnp.sum(per_anchor * sel_w) / score_sum
        total = total + seg_w * loss_seg
        aux["seg"] = loss_seg

    return total, aux
