"""Composite position loss and per-model-family training objectives.

- ``enhanced_position_loss`` — 1*L1 + 2*IoU + 0.5*length + 1*consistency
  (`enhanced_position_training.py:26-84`).
- family objectives mirroring the reference training scripts:
  ``detection_loss`` (BCE only, `train_detection.py`),
  ``detection_position_loss`` (BCE + 0.5*masked SmoothL1, `training.py`),
  ``two_stage_loss`` (+0.05 uncertainty reg, `two_stage_train.py`),
  ``seq_detector_loss`` (CE + masked L1 + 0.1*anomaly temporal MSE,
  `SignalSequenceDetection/model.py:351-422`).

Each objective returns ``(scalar_loss, dict_of_components)`` — the
reference's ``(loss, loss_dict)`` convention.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from pautdx.losses.classification import bce, cross_entropy
from pautdx.losses.regression import (
    focal_l1, interval_iou_1d, masked_iou_loss, masked_l1, masked_smooth_l1,
    temporal_consistency, uncertainty_regularizer,
)

Aux = Dict[str, jnp.ndarray]


def enhanced_position_loss(pred: jnp.ndarray, target: jnp.ndarray,
                           mask: jnp.ndarray,
                           w_l1: float = 1.0, w_iou: float = 2.0,
                           w_len: float = 0.5, w_cons: float = 1.0
                           ) -> Tuple[jnp.ndarray, Aux]:
    l1 = focal_l1(pred, target, mask)
    iou = masked_iou_loss(pred, target, mask)
    pred_len = pred[..., 1] - pred[..., 0]
    tgt_len = target[..., 1] - target[..., 0]
    m = jnp.broadcast_to(mask, pred_len.shape)
    denom = jnp.maximum(m.sum(), 1.0)
    length = jnp.sum(jnp.abs(pred_len - tgt_len) * m) / denom
    # consistency: start < end by a margin
    cons = jnp.sum(jnp.maximum(pred[..., 0] - pred[..., 1] + 0.01, 0.0) * m) / denom
    total = w_l1 * l1 + w_iou * iou + w_len * length + w_cons * cons
    return total, {"l1": l1, "iou": iou, "length": length, "consistency": cons}


def detection_loss(probs: jnp.ndarray, labels: jnp.ndarray,
                   sample_mask: Optional[jnp.ndarray] = None
                   ) -> Tuple[jnp.ndarray, Aux]:
    m = None if sample_mask is None else sample_mask[:, None]
    loss = bce(probs, labels, m)
    return loss, {"bce": loss}


def detection_position_loss(out: Dict[str, jnp.ndarray], labels: jnp.ndarray,
                            positions: jnp.ndarray,
                            sample_mask: Optional[jnp.ndarray] = None,
                            pos_weight: float = 0.5
                            ) -> Tuple[jnp.ndarray, Aux]:
    m = None if sample_mask is None else sample_mask[:, None]
    cls = bce(out["prob"], labels, m)
    defect_mask = labels if m is None else labels * m
    pos = masked_smooth_l1(out["positions"], positions, defect_mask)
    total = cls + pos_weight * pos
    return total, {"bce": cls, "position": pos}


def two_stage_loss(out: Dict[str, jnp.ndarray], labels: jnp.ndarray,
                   positions: jnp.ndarray,
                   sample_mask: Optional[jnp.ndarray] = None,
                   unc_weight: float = 0.05) -> Tuple[jnp.ndarray, Aux]:
    m = None if sample_mask is None else sample_mask[:, None]
    cls = bce(out["prob"], labels, m)
    defect_mask = labels if m is None else labels * m
    pos = masked_l1(out["positions"], positions, defect_mask)
    unc = uncertainty_regularizer(out["cls_uncertainty"]) + \
        uncertainty_regularizer(out["pos_uncertainty"])
    total = cls + pos + unc_weight * unc
    return total, {"bce": cls, "position": pos, "uncertainty": unc}


def seq_detector_loss(out: Dict[str, jnp.ndarray], class_labels: jnp.ndarray,
                      positions: jnp.ndarray,
                      sample_mask: Optional[jnp.ndarray] = None,
                      anomaly_weight: float = 0.1) -> Tuple[jnp.ndarray, Aux]:
    """class_labels: int (B, L) with 0 = Health."""
    m = None if sample_mask is None else sample_mask[:, None]
    ce = cross_entropy(out["class_logits"], class_labels, mask=m)
    defect = (class_labels > 0).astype(jnp.float32)
    if m is not None:
        defect = defect * m
    pos = masked_l1(out["positions"], positions, defect)
    cons = temporal_consistency(out["anomaly"], axis=1)
    total = ce + pos + anomaly_weight * cons
    return total, {"ce": ce, "position": pos, "anomaly_consistency": cons}


def position_accuracy_iou(pred: jnp.ndarray, target: jnp.ndarray,
                          mask: jnp.ndarray, threshold: float = 0.5
                          ) -> jnp.ndarray:
    """Fraction of masked intervals with IoU >= threshold (strict/loose
    accuracy tracking of `enhanced_position_training.py`)."""
    iou = interval_iou_1d(pred, target)
    m = jnp.broadcast_to(mask, iou.shape)
    hits = jnp.sum((iou >= threshold).astype(jnp.float32) * m)
    return hits / jnp.maximum(m.sum(), 1.0)
