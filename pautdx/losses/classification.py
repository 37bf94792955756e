"""Classification losses (BCE, focal, CE) — jit-safe, mask-aware.

Equivalents of the reference's loss idioms: ``nn.BCELoss`` on sigmoid
outputs (`train_detection.py:131-136`), ``FocalBCEWithLogitsLoss``
(`hybrid1d_detloc.py:53-71`), CE with class weights
(`SignalSequenceDetection/model.py:351-422`).

All functions reduce with an optional element mask so padded eval batches
contribute nothing.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

_EPS = 1e-7


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    mask = jnp.broadcast_to(mask, x.shape)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def bce(probs: jnp.ndarray, targets: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """BCE on probabilities (torch nn.BCELoss parity, clamped)."""
    p = jnp.clip(probs, _EPS, 1.0 - _EPS)
    loss = -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))
    return _masked_mean(loss, mask)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    pos_weight: float = 1.0) -> jnp.ndarray:
    """Numerically stable BCE from logits."""
    log_p = jnp.log1p(jnp.exp(-jnp.abs(logits))) + jnp.maximum(-logits, 0.0)
    log_not_p = log_p + logits
    loss = pos_weight * targets * log_p + (1.0 - targets) * log_not_p
    return _masked_mean(loss, mask)


def focal_bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                          alpha: float = 0.25, gamma: float = 2.0,
                          mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Focal BCE (`hybrid1d_detloc.py:53-71`)."""
    p = jnp.clip(jnp.where(logits >= 0,
                           1.0 / (1.0 + jnp.exp(-logits)),
                           jnp.exp(logits) / (1.0 + jnp.exp(logits))),
                 _EPS, 1.0 - _EPS)
    pt = jnp.where(targets > 0.5, p, 1.0 - p)
    a = jnp.where(targets > 0.5, alpha, 1.0 - alpha)
    loss = -a * (1.0 - pt) ** gamma * jnp.log(pt)
    return _masked_mean(loss, mask)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  class_weights: Optional[jnp.ndarray] = None,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """CE over the last axis; integer labels.

    With ``class_weights``, normalization is the sum of the selected
    weights (torch ``nn.CrossEntropyLoss(weight=...)`` mean reduction:
    ``sum(w[y_i] * loss_i) / sum(w[y_i])``) — dividing by element count
    instead would scale the loss with per-batch class composition.
    """
    logz = jnp.log(jnp.sum(jnp.exp(logits - logits.max(-1, keepdims=True)),
                           axis=-1)) + logits.max(-1)
    ll = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    loss = logz - ll
    if class_weights is not None:
        w = class_weights[labels]
        if mask is not None:
            w = w * mask
        return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), _EPS)
    return _masked_mean(loss, mask)
