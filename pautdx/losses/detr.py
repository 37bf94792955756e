"""DETR-family criterion: Hungarian matcher + VFL/L1/GIoU + FDR losses.

The training objective the reference gets from HF's D-FINE loss function
(`D-Fine/temporal_dfine.py:195-233` calls it per frame — SURVEY.md §3.3).

Static-shape formulation: ground truths are padded to ``max_boxes``; the
(Q x M) cost matrix is built densely inside jit, and the assignment runs
ON DEVICE with an exact Jonker-Volgenant solver (``pautdx.ops.lapjv`` —
the same algorithm scipy's ``linear_sum_assignment`` uses, which HF calls
on host). No host callback means no per-step host sync and no SPMD
"involuntary full rematerialization" under a dp mesh. Padded GT columns
carry a UNIFORM cost (uniform constants cannot change which queries the
real columns receive — exchange argument — and 0 keeps float32 duals
well-conditioned); their matches are masked out of every loss term. The
reference's fragility note (per-frame try/except with CE fallback,
`temporal_dfine.py:204-231`) becomes unnecessary: padded matching is
total, no exceptions.

Losses (RT-DETR/D-FINE recipe):
- classification: varifocal (IoU-weighted BCE) over all queries
- boxes: L1 + GIoU on matched pairs (cxcywh normalized)
- FGL: distribution focal loss of FDR corner bins against the target
  corner distances projected onto the non-uniform ``weighting_function``
  grid (interpolated two-bin CE), IoU-weighted
- auxiliary: same losses on every intermediate decoder layer + the
  encoder top-k head
- DDF: decoupled distillation focal — every earlier decoder layer's
  corner distributions are distilled (temperature-KL, T=5) against the
  FINAL layer's stop-gradient distributions (D-FINE's GO-LSD), weighted
  by matched IoU on matched queries / teacher confidence elsewhere, with
  matched/unmatched parts balanced by sqrt-counts (HF ``loss_local``
  semantics, `transformers/loss/loss_d_fine.py` DDF branch).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pautdx.models.vision.dfine import inverse_sigmoid, weighting_function


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise plain IoU for aligned (..., 4) xyxy boxes."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-9)


def giou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise generalized IoU for aligned (..., 4) xyxy boxes."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-9)
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    ewh = jnp.clip(erb - elt, 0.0)
    enclose = jnp.maximum(ewh[..., 0] * ewh[..., 1], 1e-9)
    return iou - (enclose - union) / enclose


def pairwise_giou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return giou_xyxy(a[:, None, :], b[None, :, :])


def _hungarian_host(cost: np.ndarray) -> np.ndarray:
    """(B, Q, M) cost -> (B, M) query index per gt column (full M match).

    Host scipy reference implementation, kept for cross-checking the
    on-device solver in tests; not used on the training path.
    """
    from scipy.optimize import linear_sum_assignment

    B, Q, M = cost.shape
    out = np.zeros((B, M), np.int32)
    for b in range(B):
        r, c = linear_sum_assignment(cost[b])
        # columns 0..M-1 each matched exactly once when M <= Q
        perm = np.zeros(M, np.int32)
        perm[c] = r
        out[b] = perm
    return out


def hungarian_match(cost: jnp.ndarray) -> jnp.ndarray:
    """Batch Hungarian assignment on device; cost (B, Q, M) -> (B, M)."""
    from pautdx.ops.lapjv import lapjv_batch

    cost = jax.lax.stop_gradient(
        jnp.nan_to_num(cost, nan=1e4, posinf=1e4, neginf=-1e4))
    # solver wants rows = the small side (GT columns): (B, M, Q)
    return lapjv_batch(jnp.swapaxes(cost, 1, 2))


def build_cost(logits: jnp.ndarray, boxes: jnp.ndarray,
               gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
               gt_mask: jnp.ndarray,
               cls_weight: float = 2.0, l1_weight: float = 5.0,
               giou_weight: float = 2.0, alpha: float = 0.25,
               gamma: float = 2.0) -> jnp.ndarray:
    """Per-image focal-style matching cost (B, Q, M), padded cols large."""
    prob = jax.nn.sigmoid(logits)                              # (B, Q, C)
    p = jnp.take_along_axis(
        prob, jnp.clip(gt_classes, 0)[:, None, :].repeat(prob.shape[1], 1),
        axis=-1)                                               # (B, Q, M)
    pos_cost = alpha * ((1 - p) ** gamma) * (-jnp.log(p + 1e-8))
    neg_cost = (1 - alpha) * (p ** gamma) * (-jnp.log(1 - p + 1e-8))
    cost_cls = pos_cost - neg_cost
    cost_l1 = jnp.sum(
        jnp.abs(boxes[:, :, None, :] - gt_boxes[:, None, :, :]), -1)
    xy_p = box_cxcywh_to_xyxy(boxes)
    xy_g = box_cxcywh_to_xyxy(gt_boxes)
    cost_giou = -jax.vmap(pairwise_giou)(xy_p, xy_g)
    cost = (cls_weight * cost_cls + l1_weight * cost_l1
            + giou_weight * cost_giou)
    # Padded GT columns get a UNIFORM cost: uniform per-column constants
    # never change which queries the real columns receive (exchange
    # argument), and 0 keeps the assignment duals at real-cost scale so
    # the float32 on-device solver stays exact.
    return jnp.where(gt_mask[:, None, :] > 0, cost, 0.0)


def _fgl_loss(pred_corners: jnp.ndarray, target_dist: jnp.ndarray,
              project: jnp.ndarray, weight: jnp.ndarray,
              max_num_bins: int) -> jnp.ndarray:
    """Fine-grained localization loss: two-bin interpolated CE on the
    non-uniform bin grid (D-FINE's distribution focal analogue).

    pred_corners (N, 4*(bins+1)); target_dist (N, 4) in W(n) units;
    weight (N,) IoU-based.
    """
    n_bins = max_num_bins + 1
    logits = pred_corners.reshape(-1, 4, n_bins)
    t = target_dist.reshape(-1, 4)
    # locate t between project bins (project ascending)
    idx = jnp.clip(jnp.searchsorted(project, t, side="right") - 1,
                   0, n_bins - 2)
    left = project[idx]
    right = project[idx + 1]
    wr = jnp.clip((t - left) / jnp.maximum(right - left, 1e-8), 0.0, 1.0)
    wl = 1.0 - wr
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, idx[..., None], -1)[..., 0]
    lr = jnp.take_along_axis(logits, (idx + 1)[..., None], -1)[..., 0]
    ce = wl * (logz - ll) + wr * (logz - lr)
    return jnp.sum(ce.mean(-1) * weight)


def _ddf_loss(student_corners: jnp.ndarray, teacher_corners: jnp.ndarray,
              weight: jnp.ndarray, pos_mask: jnp.ndarray,
              max_num_bins: int, temperature: float = 5.0) -> jnp.ndarray:
    """Decoupled distillation focal (GO-LSD self-distillation).

    student/teacher corners (B, Q, 4*(bins+1)); weight (B, Q) — matched
    IoU at matched queries, teacher max-prob elsewhere (stop-gradient);
    pos_mask (B, Q) in {0, 1} marking real matched queries. Matched and
    unmatched means are combined with sqrt-count weights; the HF
    ``batch_scale`` factor cancels in that weighted average.
    """
    n_bins = max_num_bins + 1
    B, Q = pos_mask.shape
    s = student_corners.reshape(B, Q, 4, n_bins) / temperature
    t = jax.lax.stop_gradient(teacher_corners).reshape(
        B, Q, 4, n_bins) / temperature
    q = jax.nn.softmax(t, axis=-1)
    kl = jnp.sum(q * (jax.nn.log_softmax(t, -1) - jax.nn.log_softmax(s, -1)),
                 axis=-1)                                    # (B, Q, 4)
    kl = (temperature ** 2) * kl.mean(-1) * jax.lax.stop_gradient(weight)
    pos = jnp.sum(pos_mask)
    neg = B * Q - pos
    mean_pos = jnp.sum(kl * pos_mask) / jnp.maximum(pos, 1.0)
    mean_neg = jnp.sum(kl * (1.0 - pos_mask)) / jnp.maximum(neg, 1.0)
    wp = jnp.sqrt(pos)
    wn = jnp.sqrt(neg)
    return (mean_pos * wp + mean_neg * wn) / jnp.maximum(wp + wn, 1e-8)


@functools.partial(jax.jit, static_argnames=("num_labels", "max_num_bins",
                                             "reg_scale", "up",
                                             "legacy_vfl"))
def dfine_criterion(outputs: Dict, gt_boxes: jnp.ndarray,
                    gt_classes: jnp.ndarray, gt_mask: jnp.ndarray,
                    num_labels: int, max_num_bins: int = 32,
                    reg_scale: float = 4.0, up: float = 0.5,
                    cls_weight: float = 1.0, l1_weight: float = 5.0,
                    giou_weight: float = 2.0, fgl_weight: float = 0.15,
                    ddf_weight: float = 1.5, legacy_vfl: bool = False
                    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full D-FINE training loss over final + auxiliary heads.

    outputs: the DFine.__call__ dict (train=True); gt_boxes (B, M, 4)
    cxcywh normalized, gt_classes (B, M), gt_mask (B, M).

    legacy_vfl: DIAGNOSTIC ONLY (tools/criterion_ab.py) — reproduces the
    pre-round-4 objective (clipped-GIoU VFL quality target, target and
    focal weight NOT detached) so the criterion-fix quality shift can be
    measured in a controlled A/B. Never use for training models you
    intend to ship; the detached form is the HF-faithful one.
    """
    project = weighting_function(max_num_bins, up, reg_scale)
    total = 0.0
    aux: Dict[str, jnp.ndarray] = {}
    n_heads = len(outputs["intermediate_logits"])
    num_boxes = jnp.maximum(gt_mask.sum(), 1.0)

    def one_head(logits, boxes, corners=None, refs=None):
        cost = build_cost(logits, boxes, gt_boxes, gt_classes, gt_mask)
        match = hungarian_match(cost)                       # (B, M)
        B, Q, C = logits.shape
        M = gt_boxes.shape[1]
        b_idx = jnp.arange(B)[:, None]
        m_boxes = boxes[b_idx, match]                       # (B, M, 4)
        xy_p = box_cxcywh_to_xyxy(m_boxes)
        xy_g = box_cxcywh_to_xyxy(gt_boxes)
        giou = giou_xyxy(xy_p, xy_g)
        # VFL quality target: PLAIN IoU (HF uses box_iou — clipped GIoU
        # understates quality whenever the enclosing-box penalty bites),
        # DETACHED like HF's `ious.detach()`: the classification target
        # must not backprop into the box head, and the focal weight's
        # prob**2 must not add a push-your-own-score-down gradient.
        if legacy_vfl:
            iou = jnp.clip(giou, 0.0)                        # (B, M)
        else:
            iou = jax.lax.stop_gradient(iou_xyxy(xy_p, xy_g))  # (B, M)

        # varifocal classification: target q = IoU at matched slots
        t_cls = jnp.zeros((B, Q, C))
        q_val = (iou * gt_mask)
        t_cls = t_cls.at[b_idx, match, jnp.clip(gt_classes, 0)].max(
            jnp.where(gt_mask > 0, q_val, 0.0))
        prob = jax.nn.sigmoid(logits)
        if not legacy_vfl:
            prob = jax.lax.stop_gradient(prob)
        weight = 0.75 * prob ** 2.0 * (t_cls <= 0) + t_cls
        logz = jnp.log1p(jnp.exp(-jnp.abs(logits))) + jnp.maximum(-logits, 0)
        bce = t_cls * logz + (1 - t_cls) * (logz + logits)
        loss_cls = jnp.sum(bce * weight) / num_boxes

        l1 = jnp.sum(jnp.abs(m_boxes - gt_boxes), -1)
        loss_l1 = jnp.sum(l1 * gt_mask) / num_boxes
        loss_giou = jnp.sum((1.0 - giou) * gt_mask) / num_boxes
        head_total = (cls_weight * loss_cls + l1_weight * loss_l1
                      + giou_weight * loss_giou)

        if corners is not None:
            # FGL: distances from initial reference centers to gt corners
            # in weighting-function units
            ref = refs[b_idx, match]                         # (B, M, 4)
            gxy = box_cxcywh_to_xyxy(gt_boxes)
            rs = abs(reg_scale)
            d_l = (ref[..., 0] - gxy[..., 0]) * rs / jnp.maximum(ref[..., 2], 1e-6) - 0.5 * rs
            d_t = (ref[..., 1] - gxy[..., 1]) * rs / jnp.maximum(ref[..., 3], 1e-6) - 0.5 * rs
            d_r = (gxy[..., 2] - ref[..., 0]) * rs / jnp.maximum(ref[..., 2], 1e-6) - 0.5 * rs
            d_b = (gxy[..., 3] - ref[..., 1]) * rs / jnp.maximum(ref[..., 3], 1e-6) - 0.5 * rs
            tdist = jnp.stack([d_l, d_t, d_r, d_b], -1)
            m_corners = corners[b_idx, match]
            w = (iou * gt_mask).reshape(-1)
            fgl = _fgl_loss(m_corners.reshape(-1, corners.shape[-1]),
                            tdist.reshape(-1, 4), project, w, max_num_bins)
            head_total = head_total + fgl_weight * fgl / num_boxes
        return head_total, loss_cls, loss_l1, loss_giou, match, iou

    # final + intermediate decoder heads
    all_corners = outputs["intermediate_corners"]
    # DDF teacher: the FINAL layer's corner distributions / confidences
    # (absent in heads that carry no FDR corners, e.g. temporal variants)
    teacher_corners = all_corners[-1] if all_corners else None
    teacher_conf = jax.lax.stop_gradient(
        jax.nn.sigmoid(outputs["intermediate_logits"][-1]).max(-1))
    loss_ddf = 0.0
    for i in range(n_heads):
        corners = None
        refs = None
        n_extra = n_heads - len(all_corners)
        if i >= n_extra:
            corners = all_corners[i - n_extra]
            refs = outputs["initial_references"][i - n_extra]
        ht, lc, ll, lg, match, iou = one_head(
            outputs["intermediate_logits"][i],
            outputs["intermediate_boxes"][i], corners, refs)
        total = total + ht
        if i == n_heads - 1:
            aux.update({"cls": lc, "l1": ll, "giou": lg})
        # DDF: distil every EARLIER layer's corner bins toward the final
        # layer's (the final layer distils nothing — it IS the teacher)
        if corners is not None and i < n_heads - 1:
            B, Q = teacher_conf.shape
            b_idx = jnp.arange(B)[:, None]
            pos_mask = jnp.zeros((B, Q)).at[b_idx, match].max(gt_mask)
            w_at = teacher_conf[b_idx, match]
            w = teacher_conf.at[b_idx, match].set(
                jnp.where(gt_mask > 0, iou, w_at))
            loss_ddf = loss_ddf + _ddf_loss(corners, teacher_corners, w,
                                            pos_mask, max_num_bins)
    if not isinstance(loss_ddf, float):
        total = total + ddf_weight * loss_ddf
        aux["ddf"] = loss_ddf

    # encoder head — optional: heads without a real encoder-selection
    # output (temporal variants) simply omit the keys. Aliasing the
    # final head's predictions here would double-count every loss term
    # AND solve a redundant Hungarian match per step.
    if "enc_topk_logits" in outputs:
        ht, _, _, _, _, _ = one_head(outputs["enc_topk_logits"],
                                     outputs["enc_topk_bboxes"])
        total = total + ht
    aux["total"] = total
    return total, aux
