"""Regression losses for defect positions: masked L1/SmoothL1, 1D IoU.

Equivalents of the masked-position idiom repeated across the reference
(`training.py:16-325` BCE + 0.5*masked SmoothL1;
`SignalSequenceDetection/model.py:351-422` masked L1;
`hybrid1d_detloc.py:38-50` interval IoU).

Position targets use the (0, 0) healthy fallback, so every position loss is
masked by the defect labels — healthy signals never contribute.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def interval_iou_1d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU of (..., 2) [start, end] intervals."""
    lo = jnp.maximum(a[..., 0], b[..., 0])
    hi = jnp.minimum(a[..., 1], b[..., 1])
    inter = jnp.maximum(hi - lo, 0.0)
    union = (a[..., 1] - a[..., 0]) + (b[..., 1] - b[..., 0]) - inter
    return inter / jnp.maximum(union, 1e-8)


def _apply_mask(loss_el: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(loss_el)
    mask = jnp.broadcast_to(mask, loss_el.shape)
    return jnp.sum(loss_el * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray,
              mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean |pred-target| over masked elements; mask broadcasts over the
    trailing (start, end) axis."""
    loss = jnp.abs(pred - target)
    m = None if mask is None else mask[..., None]
    return _apply_mask(loss, m)


def masked_smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
                     mask: Optional[jnp.ndarray],
                     beta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(pred - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    m = None if mask is None else mask[..., None]
    return _apply_mask(loss, m)


def masked_iou_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean (1 - IoU1D) over masked intervals."""
    loss = 1.0 - interval_iou_1d(pred, target)
    return _apply_mask(loss, mask)


def focal_l1(pred: jnp.ndarray, target: jnp.ndarray,
             mask: Optional[jnp.ndarray], gamma: float = 1.0,
             beta: float = 0.1) -> jnp.ndarray:
    """FocalL1 (`enhanced_position_training.py:26-84`): errors above beta are
    up-weighted by (err/beta)^gamma — focuses capacity on hard positions."""
    d = jnp.abs(pred - target)
    w = jnp.where(d > beta, (d / beta) ** gamma, 1.0)
    loss = w * d
    m = None if mask is None else mask[..., None]
    return _apply_mask(loss, m)


def temporal_consistency(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """MSE between neighbouring steps along the sequence ``axis`` — the
    anomaly temporal-consistency regularizer (`model.py:351-422`,
    0.1 weight)."""
    return jnp.mean(jnp.square(jnp.diff(x, axis=axis)))


def uncertainty_regularizer(unc: jnp.ndarray) -> jnp.ndarray:
    """mean(exp(-u) + u) (`enhanced_model.py:585-699`): pulls uncertainty
    towards small positive values without letting it collapse."""
    return jnp.mean(jnp.exp(-unc) + unc)
