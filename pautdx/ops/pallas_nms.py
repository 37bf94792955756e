"""Pallas TPU kernel: greedy NMS suppression sweep.

Design (per the repo's TPU NMS strategy, SURVEY.md §7 hard parts):
the O(K^2) IoU matrix of the K score-sorted candidates is computed by XLA
(it fuses into a handful of VPU ops), and the inherently *sequential*
greedy sweep — the part XLA cannot parallelize or fuse well — runs as a
single Pallas kernel over VMEM-resident rows: one dynamic row slice plus a
vectorized keep-mask update per step, no HBM traffic inside the loop.

Candidate counts are small (K <= 512), so the whole working set
(K x K IoU + the keep row) sits in VMEM. Lane-dim scalar reads are avoided
by reducing ``keep * onehot(i)`` on the VPU.

Falls back to interpret mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pautdx.ops.nms import box_iou_matrix


def _suppress_kernel(iou_ref, valid_ref, keep_ref, *, iou_threshold: float):
    k = iou_ref.shape[0]
    keep_ref[0, :] = valid_ref[0, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, _):
        alive = jnp.sum(jnp.where(lane == i, keep_ref[0, :], 0.0))
        row = iou_ref[pl.ds(i, 1), :]                       # (1, k)
        suppress = (row > iou_threshold) & (lane > i) & (alive > 0.0)
        keep_ref[0, :] = jnp.where(suppress[0], 0.0, keep_ref[0, :])
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_suppress(iou: jnp.ndarray, valid: jnp.ndarray,
                 iou_threshold: float = 0.45,
                 interpret: bool = False) -> jnp.ndarray:
    """iou (K, K) of score-sorted boxes; valid (K,) initial mask ->
    keep (K,) float mask after the greedy sweep."""
    k = iou.shape[0]
    keep = pl.pallas_call(
        functools.partial(_suppress_kernel, iou_threshold=iou_threshold),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(iou.astype(jnp.float32), valid.astype(jnp.float32).reshape(1, k))
    return keep[0]


def pallas_nms(boxes: jnp.ndarray, scores: jnp.ndarray, classes: jnp.ndarray,
               *, iou_threshold: float = 0.45, score_threshold: float = 0.25,
               top_k: int = 256, max_det: int = 100,
               class_aware: bool = True,
               interpret: bool = None) -> Dict[str, jnp.ndarray]:
    """Drop-in replacement for ``pautdx.ops.nms.nms`` with the sweep in
    Pallas. Same fixed-size contract, EXCEPT the default ``top_k`` is 256
    (a lane-aligned tile; nms() defaults to 300) — pass top_k explicitly
    when candidate parity with the XLA path matters on crowded images."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = min(top_k, scores.shape[0])
    scores = jnp.where(scores >= score_threshold, scores, 0.0)
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = boxes[order]
    top_classes = classes[order]
    nms_boxes = top_boxes
    if class_aware:
        # (max_coord + 1) class stride — see ops/nms.py precision note
        nms_boxes = top_boxes + top_classes.astype(jnp.float32)[:, None] * (
            jnp.max(jnp.abs(top_boxes)) + 1.0)
    iou = box_iou_matrix(nms_boxes)
    keep = nms_suppress(iou, (top_scores > 0).astype(jnp.float32),
                        iou_threshold, interpret)
    kept_scores = top_scores * keep
    final_scores, idx = jax.lax.top_k(kept_scores, max_det)
    valid = final_scores > 0.0
    return {
        "boxes": top_boxes[idx] * valid[:, None],
        "scores": final_scores,
        "classes": jnp.where(valid, top_classes[idx], -1),
        "valid": valid,
        "indices": order[idx],
    }
