"""Contrastive denoising training groups for D-FINE — static shapes.

The training-quality feature HF builds host-side with dynamic shapes
(`get_contrastive_denoising_training_group`): noised copies of the ground
truths are fed as extra decoder queries; positives must reconstruct their
GT, negatives (heavier box noise) must predict background; an attention
mask isolates groups from each other and from the matching queries.

TPU-native version: GTs are already padded to a static M, so the group
layout is fully static — ``2 * M * num_groups`` denoising queries, the
mask is a constant, and the noise is drawn inside jit from an explicit
PRNG key. Padded GT slots become negatives with zero loss weight.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from pautdx.losses.detr import box_cxcywh_to_xyxy, giou_xyxy
from pautdx.models.vision.dfine import inverse_sigmoid


def denoising_group_size(max_boxes: int, num_denoising: int = 100
                         ) -> Tuple[int, int]:
    """(num_groups, total_dn_queries) — static given the GT padding M."""
    groups = max(1, num_denoising // max(max_boxes, 1))
    return groups, 2 * max_boxes * groups


def make_denoising_queries(rng: jax.Array, gt_boxes: jnp.ndarray,
                           gt_classes: jnp.ndarray, gt_mask: jnp.ndarray,
                           num_labels: int, num_queries: int,
                           num_denoising: int = 100,
                           label_noise: float = 0.5,
                           box_noise: float = 1.0) -> Dict[str, jnp.ndarray]:
    """Returns {"class_ids" (B, D), "box_logits" (B, D, 4),
    "attn_mask" (D+Q, D+Q), "is_positive" (B, D), "gt_index" (B, D),
    "weight" (B, D)} with D = 2*M*groups."""
    B, M, _ = gt_boxes.shape
    groups, D = denoising_group_size(M, num_denoising)
    k1, k2, k3, k4 = jax.random.split(rng, 4)

    # tile GTs: [pos(M), neg(M)] x groups
    tiled_boxes = jnp.tile(gt_boxes, (1, 2 * groups, 1))         # (B, D, 4)
    tiled_classes = jnp.tile(gt_classes, (1, 2 * groups))
    tiled_mask = jnp.tile(gt_mask, (1, 2 * groups))
    block = jnp.arange(D) // M
    is_negative = (block % 2 == 1)                               # (D,)
    is_positive = jnp.broadcast_to(~is_negative, (B, D)) & (tiled_mask > 0)

    # label noise: random re-label with prob label_noise/2 (HF semantics)
    flip = jax.random.uniform(k1, (B, D)) < (label_noise * 0.5)
    rand_label = jax.random.randint(k2, (B, D), 0, num_labels)
    class_ids = jnp.where(flip & (tiled_mask > 0), rand_label,
                          jnp.clip(tiled_classes, 0))
    # padded slots -> the embedding's padding id (num_labels)
    class_ids = jnp.where(tiled_mask > 0, class_ids, num_labels)

    # box noise in corner space: positives within 0.5*wh, negatives 1-2x
    corners = box_cxcywh_to_xyxy(tiled_boxes)
    diff = jnp.tile(tiled_boxes[..., 2:] * 0.5, (1, 1, 2)) * box_noise
    sign = jax.random.randint(k3, corners.shape, 0, 2) * 2.0 - 1.0
    part = jax.random.uniform(k4, corners.shape)
    part = jnp.where(is_negative[None, :, None], part + 1.0, part)
    noised = jnp.clip(corners + sign * part * diff, 0.0, 1.0)
    cx = (noised[..., 0] + noised[..., 2]) / 2
    cy = (noised[..., 1] + noised[..., 3]) / 2
    w = noised[..., 2] - noised[..., 0]
    h = noised[..., 3] - noised[..., 1]
    box_logits = inverse_sigmoid(jnp.stack([cx, cy, w, h], -1))

    # attention mask (additive, 0 = attend, -inf = blocked)
    L = D + num_queries
    neg_inf = -1e9
    mask = jnp.zeros((L, L))
    # matching queries cannot see denoising queries
    mask = mask.at[D:, :D].set(neg_inf)
    # denoising groups cannot see each other (pos+neg pair = one group)
    q_block = jnp.arange(D) // (2 * M)
    same = q_block[:, None] == q_block[None, :]
    dn_mask = jnp.where(same, 0.0, neg_inf)
    mask = mask.at[:D, :D].set(dn_mask)
    # NOTE: [dn -> match] stays open, matching the torch mask, which only
    # blocks [match -> dn] and cross-group [dn -> dn]
    gt_index = jnp.broadcast_to(jnp.arange(D) % M, (B, D))
    return {"class_ids": class_ids, "box_logits": box_logits,
            "attn_mask": mask, "is_positive": is_positive,
            "gt_index": gt_index, "weight": tiled_mask}


def denoising_loss(dn_logits: jnp.ndarray, dn_boxes: jnp.ndarray,
                   dn: Dict[str, jnp.ndarray], gt_boxes: jnp.ndarray,
                   gt_classes: jnp.ndarray,
                   cls_weight: float = 1.0, l1_weight: float = 5.0,
                   giou_weight: float = 2.0) -> Tuple[jnp.ndarray, Dict]:
    """Direct (index-matched, no Hungarian) loss on denoising outputs.

    dn_logits (B, D, C), dn_boxes (B, D, 4) cxcywh; positives reconstruct
    their source GT, negatives and padded slots get background targets.
    """
    B, D, C = dn_logits.shape
    b_idx = jnp.arange(B)[:, None]
    src_boxes = gt_boxes[b_idx, dn["gt_index"]]
    src_classes = jnp.clip(gt_classes[b_idx, dn["gt_index"]], 0)
    pos = dn["is_positive"].astype(jnp.float32)
    num_pos = jnp.maximum(pos.sum(), 1.0)

    t_cls = jnp.zeros((B, D, C)).at[
        b_idx, jnp.arange(D)[None, :], src_classes].set(pos)
    logz = jnp.log1p(jnp.exp(-jnp.abs(dn_logits))) + jnp.maximum(-dn_logits, 0)
    bce = t_cls * logz + (1 - t_cls) * (logz + dn_logits)
    # focal-ish down-weighting of easy negatives; prob DETACHED (the
    # weight must not push scores down through its own gradient), and
    # padded-GT slots excluded via the per-slot weight — the module
    # contract is "padding = zero loss weight", real noised negatives
    # still train toward background
    prob = jax.lax.stop_gradient(jax.nn.sigmoid(dn_logits))
    weight = ((0.75 * prob ** 2.0 * (t_cls <= 0) + t_cls)
              * dn["weight"][..., None])
    loss_cls = jnp.sum(bce * weight) / num_pos

    l1 = jnp.sum(jnp.abs(dn_boxes - src_boxes), -1)
    loss_l1 = jnp.sum(l1 * pos) / num_pos
    giou = giou_xyxy(box_cxcywh_to_xyxy(dn_boxes),
                     box_cxcywh_to_xyxy(src_boxes))
    loss_giou = jnp.sum((1.0 - giou) * pos) / num_pos
    total = cls_weight * loss_cls + l1_weight * loss_l1 + giou_weight * loss_giou
    return total, {"dn_cls": loss_cls, "dn_l1": loss_l1, "dn_giou": loss_giou}
