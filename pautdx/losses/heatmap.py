"""CenterNet-style 1D heatmap targets + the DetLoc criterion.

Equivalent of `hybrid1111/hybrid1d_detloc.py:288-349`:
- Gaussian heatmaps at defect centers per pyramid scale (`:288-294`)
- loss = focal-BCE(heatmap) + masked SmoothL1(center offset, log width)
  + (1 - IoU1D), summed over scales (`:296-349`)

Everything is computed with static shapes: targets are built *inside jit*
from the (B, N, 2) normalized position tensor + (B, N) labels, so no host
target-building loop is needed (the reference builds targets in Python per
batch — here it's one fused XLA program).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp

from pautdx.losses.classification import focal_bce_with_logits
from pautdx.losses.regression import interval_iou_1d

# single source of truth for the 1D pyramid strides (decode must match
# target building)
from pautdx.models.signal.detloc1d import STRIDES  # noqa: F401,E402


def gaussian_heatmap_1d(centers: jnp.ndarray, widths: jnp.ndarray,
                        valid: jnp.ndarray, n_cells: int, stride: int,
                        signal_length: int) -> jnp.ndarray:
    """(B, N) centers/widths in samples -> (B, N, n_cells) gaussian heatmap."""
    cell_centers = (jnp.arange(n_cells, dtype=jnp.float32) + 0.5) * stride
    sigma = jnp.maximum(widths / 6.0, stride / 2.0)
    d = cell_centers[None, None, :] - centers[..., None]
    hm = jnp.exp(-0.5 * jnp.square(d / sigma[..., None]))
    return hm * valid[..., None]


def detloc_targets(labels: jnp.ndarray, positions: jnp.ndarray,
                   signal_length: int, n_cells: Tuple[int, ...],
                   strides: Tuple[int, ...] = STRIDES) -> List[Dict[str, jnp.ndarray]]:
    """Per-scale targets: heatmap, center-offset, log-width, positive mask."""
    start = positions[..., 0] * signal_length
    end = positions[..., 1] * signal_length
    centers = 0.5 * (start + end)
    widths = jnp.maximum(end - start, 1.0)
    valid = labels
    out = []
    for nc, s in zip(n_cells, strides):
        hm = gaussian_heatmap_1d(centers, widths, valid, nc, s, signal_length)
        cell_idx = jnp.clip((centers / s - 0.5).round(), 0, nc - 1)
        cells = jnp.arange(nc, dtype=jnp.float32)
        is_center = (cells[None, None, :] == cell_idx[..., None])
        pos_mask = is_center * valid[..., None]
        offset = (centers / s - 0.5)[..., None] - cells[None, None, :]
        log_w = jnp.log(widths / s)[..., None] * jnp.ones_like(offset)
        out.append({"heatmap": hm, "offset": offset, "log_width": log_w,
                    "pos_mask": pos_mask})
    return out


def detloc_criterion(outs: List[Dict[str, jnp.ndarray]],
                     labels: jnp.ndarray, positions: jnp.ndarray,
                     signal_length: int,
                     strides: Tuple[int, ...] = STRIDES,
                     w_reg: float = 1.0, w_iou: float = 1.0
                     ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    n_cells = tuple(o["cls"].shape[-1] for o in outs)
    targets = detloc_targets(labels, positions, signal_length, n_cells, strides)
    total_cls = 0.0
    total_reg = 0.0
    total_iou = 0.0
    for out, tgt, stride in zip(outs, targets, strides):
        total_cls = total_cls + focal_bce_with_logits(out["cls"], tgt["heatmap"])
        pm = tgt["pos_mask"]
        denom = jnp.maximum(pm.sum(), 1.0)
        # tanh on the offset matches the decode in nn.fpn1d.decode_1d
        pred_off = jnp.tanh(out["reg"][..., 0])
        pred_lw = out["reg"][..., 1]
        d_off = jnp.abs(pred_off - tgt["offset"])
        d_lw = jnp.abs(pred_lw - tgt["log_width"])
        smooth = lambda d: jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)  # noqa: E731
        total_reg = total_reg + jnp.sum((smooth(d_off) + smooth(d_lw)) * pm) / denom
        # IoU of decoded intervals at positive cells
        cells = jnp.arange(out["cls"].shape[-1], dtype=jnp.float32)
        center = (cells[None, None, :] + 0.5 + pred_off) * stride
        width = jnp.exp(jnp.clip(pred_lw, -4.0, 4.0)) * stride
        pred_iv = jnp.stack([center - width / 2, center + width / 2], axis=-1)
        tgt_start = positions[..., 0:1] * signal_length
        tgt_end = positions[..., 1:2] * signal_length
        tgt_iv = jnp.stack(
            [jnp.broadcast_to(tgt_start, center.shape),
             jnp.broadcast_to(tgt_end, center.shape)], axis=-1)
        iou = interval_iou_1d(pred_iv, tgt_iv)
        total_iou = total_iou + jnp.sum((1.0 - iou) * pm) / denom
    total = total_cls + w_reg * total_reg + w_iou * total_iou
    return total, {"heatmap": total_cls, "reg": total_reg, "iou": total_iou}
