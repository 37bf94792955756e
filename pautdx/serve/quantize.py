"""Weight-only int8 quantization for serving (SURVEY.md §7 stage 8).

The D-FINE serving model is HBM-bandwidth-bound at production batch
sizes (`models/vision/dfine.py` perf notes): every step re-reads the
full weight set from HBM. Storing kernels as int8 with per-output-
channel scales quarters that traffic vs f32 (halves vs bf16); the
dequantize (``convert(s8->bf16) * scale``) is elementwise and fuses
into the consuming matmul/conv under XLA, so the MXU still computes in
bf16 at full accuracy headroom.

This replaces the capability the reference gets from Ultralytics/ONNX
``int8=True`` export knobs (`BscanBased/yolo/yolo_bbox_retrain.py:39`,
`D-Fine/export_onnx.py` — the torch repo exports quantized inference
artifacts; here quantization is a pure variables-tree transform and the
model code is untouched).

Symmetric per-channel scheme: ``q = round(w / s)``, ``s = absmax / 127``
over all axes but the last (flax kernels put output features last).
Leaves smaller than ``min_size`` and all 1-D leaves (biases, BN stats,
LayerNorm scales) stay in their original dtype — they are a rounding
error of total bytes but carry disproportionate precision.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

_QKEYS = frozenset(("__q8__", "__s8__"))


def _is_quantizable(name: str, leaf, min_size: int) -> bool:
    if not hasattr(leaf, "ndim") or leaf.ndim < 2:
        return False
    if leaf.size < min_size:
        return False
    # kernels and embedding tables; never BN/LayerNorm stats
    return name in ("kernel", "embedding")


def quantize_variables(variables: Dict, min_size: int = 4096) -> Dict:
    """Variables tree -> same tree with large kernels replaced by
    ``{"__q8__": int8, "__s8__": per-channel scale}`` nodes."""

    def walk(tree):
        out = {}
        for k, v in dict(tree).items():
            if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
                out[k] = walk(v)
            elif _is_quantizable(k, v, min_size):
                w = jnp.asarray(v)
                axes = tuple(range(w.ndim - 1))
                s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axes,
                            keepdims=True) / 127.0
                s = jnp.maximum(s, 1e-12)
                q = jnp.clip(jnp.round(w.astype(jnp.float32) / s),
                             -127, 127).astype(jnp.int8)
                out[k] = {"__q8__": q, "__s8__": s.astype(jnp.float32)}
            else:
                out[k] = v
        return out

    return {g: walk(t) for g, t in variables.items()}


def dequantize_variables(qvars: Dict, dtype=jnp.bfloat16) -> Dict:
    """Inverse transform, trace-safe: int8 leaves stay int8 *inputs* to
    the jitted computation; the convert+scale happens on device and XLA
    fuses it into the consumer."""

    def walk(tree):
        out = {}
        for k, v in dict(tree).items():
            if isinstance(v, dict) and set(v.keys()) == _QKEYS:
                out[k] = (v["__q8__"].astype(jnp.float32)
                          * v["__s8__"]).astype(dtype)
            elif isinstance(v, dict) or type(v).__name__ == "FrozenDict":
                out[k] = walk(v)
            else:
                out[k] = v
        return out

    return {g: walk(t) for g, t in qvars.items()}


def quantized_bytes(tree: Any) -> Tuple[int, int]:
    """(bytes as stored, bytes if everything were bf16) — HBM-traffic
    accounting for the perf notes."""
    stored = 0
    dense = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        stored += leaf.size * leaf.dtype.itemsize
        dense += leaf.size * 2
    return stored, dense


def make_quantized_apply(model, variables, min_size: int = 4096,
                         dtype=jnp.bfloat16):
    """Returns (apply_fn(images) -> model output dict, qvars).

    ``apply_fn`` closes over the int8 tree; jit it (or wrap it in the
    streaming scan) and the weights ship to the device as int8.
    """
    qvars = quantize_variables(variables, min_size=min_size)

    def apply_fn(images, **kw):
        return model.apply(dequantize_variables(qvars, dtype), images,
                           train=False, **kw)

    return apply_fn, qvars
