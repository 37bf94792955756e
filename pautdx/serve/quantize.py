"""Weight-only int8 quantization for serving (SURVEY.md §7 stage 8).

The D-FINE serving model is HBM-bandwidth-bound at production batch
sizes (`models/vision/dfine.py` perf notes). Storing kernels as int8
with per-output-channel scales halves their storage vs bf16; the
dequantize (``convert(s8->bf16) * scale``) is elementwise.

MEASURED NEGATIVE RESULT for this model (PERF_INT8.json, PROGRESS.md):
inside the jitted streaming scan the closed-over int8 tree is a
loop-invariant constant, so XLA hoists the dequantize out of the loop
and the per-step weight reads are the SAME bf16 tensors as the dense
baseline — plus the one-time dequant (-2% fps). Weights are also only
~0.1% of per-frame traffic here. The transform remains useful for
checkpoint/transfer size and as the storage layer for a future
activation-int8 path; do not expect per-step HBM savings from
weight-only int8 under a scan.

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
    """Inverse transform, trace-safe: the convert+scale happens on
    device (under a scan, XLA hoists it to loop-invariant code — see the
    module docstring)."""

    def walk(tree):
        out = {}
        for k, v in dict(tree).items():
            # Mapping check (not `type(v) is dict`): a FrozenDict-wrapped
            # quantized node must dequantize, not recurse-through
            if hasattr(v, "keys") and set(v.keys()) == _QKEYS:
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

    def walk(t):
        nonlocal stored, dense
        for k, v in dict(t).items():
            if hasattr(v, "keys") and set(v.keys()) == _QKEYS:
                stored += (v["__q8__"].size * v["__q8__"].dtype.itemsize
                           + v["__s8__"].size * v["__s8__"].dtype.itemsize)
                # dense baseline: the kernel alone — scales are pure
                # quantization overhead and must not inflate it
                dense += v["__q8__"].size * 2
            elif hasattr(v, "keys"):
                walk(v)
            else:
                stored += v.size * v.dtype.itemsize
                dense += v.size * 2

    for t in dict(tree).values():
        walk(t)
    return stored, dense


# ---------------------------------------------------------------------------
# Activation-side int8 (the lever weight-only int8 is not — see the
# negative result above): conv sites in the backbone/neck quantize their
# INPUT with a static calibrated scale and run s8 x s8 -> s32 on the MXU
# (`pautdx.ops.qconv`, wired into hgnet.ConvLayer / dfine.ConvNorm).
# Calibration = run representative batches with mutable=["calib"], which
# makes every conv site sow max|input|; the collection below turns those
# into the "quant" variables the int8 branch keys on.
# ---------------------------------------------------------------------------


def calibrate_int8(apply_calib, batches) -> Dict:
    """Collect per-conv-site input scales over calibration batches.

    ``apply_calib(batch)`` must run the model with ``mutable=["calib"]``
    and return the mutated variables (or the ``(out, mutated)`` pair
    flax returns), e.g.::

        def apply_calib(images):
            return model.apply(variables, images, train=False,
                               mutable=["calib"])
        quant = calibrate_int8(apply_calib, batches)
        out = model.apply({**variables, "quant": quant}, images,
                          train=False)

    Returns the "quant" collection: the calib tree with each site's
    ``in_absmax`` (reduced by max across batches) mapped to
    ``in_scale = absmax / 127`` (symmetric int8).
    """
    merged = None
    for batch in batches:
        res = apply_calib(batch)
        mutated = res[1] if isinstance(res, tuple) else res
        calib = dict(mutated)["calib"]
        if merged is None:
            merged = calib
        else:
            merged = jax.tree_util.tree_map(jnp.maximum, merged, calib)
    if merged is None:
        raise ValueError("calibrate_int8: no calibration batches given")
    return scales_from_calib(merged)


def scales_from_calib(calib: Dict) -> Dict:
    """"calib" collection (``in_absmax`` leaves) -> "quant" collection
    (``in_scale`` leaves). The 1e-8 floor keeps a dead site (all-zero
    input in every calibration batch) from dividing by zero; its conv
    then sees all-zero int8 inputs, which is exact."""

    def walk(tree):
        out = {}
        for k, v in dict(tree).items():
            if k == "in_absmax":
                out["in_scale"] = (
                    jnp.maximum(jnp.asarray(v, jnp.float32), 1e-8) / 127.0)
            else:
                out[k] = walk(v)
        return out

    return walk(dict(calib))


def drop_quant_sites(quant: Dict, predicate) -> Dict:
    """Prune sites from a "quant" collection: keep a site only when
    ``predicate("/".join(path))`` is true. Sites without a scale fall
    back to the dense conv — per-site accuracy triage without touching
    model code."""

    def walk(tree, path):
        out = {}
        for k, v in dict(tree).items():
            if k == "in_scale":
                if predicate("/".join(path)):
                    out[k] = v
            else:
                sub = walk(v, path + (k,))
                if sub:
                    out[k] = sub
        return out

    return walk(dict(quant), ())


def make_int8_apply(model, variables, calib_batches, drop=None):
    """Activation-int8 serving in one call: calibrate conv-input scales
    on ``calib_batches`` (device arrays shaped like serving inputs) and
    return ``(apply_fn, quant)`` where ``apply_fn(images)`` runs the
    model with backbone/neck convs in s8 x s8 -> s32.

    ``drop``: optional ``predicate(site_path) -> bool`` keeping a subset
    of sites int8 (see ``drop_quant_sites``) — per-site accuracy triage.
    The calibration apply is jitted (op-by-op dispatch is untenable over
    tunneled runtimes); same-shaped batches share one executable.
    """
    calib_fn = jax.jit(lambda b: model.apply(
        variables, b, train=False, mutable=["calib"]))
    quant = calibrate_int8(calib_fn, calib_batches)
    if drop is not None:
        quant = drop_quant_sites(quant, drop)
    merged = {**dict(variables), "quant": quant}

    def apply_fn(images):
        return model.apply(merged, images, train=False)

    return apply_fn, quant


def make_quantized_apply(model, variables, min_size: int = 4096,
                         dtype=jnp.bfloat16):
    """Returns (apply_fn(images) -> model output dict, qvars).

    ``apply_fn`` closes over the int8 tree; the weights upload as int8
    (4x smaller transfer). Under a jitted scan the per-step HBM benefit
    vanishes (loop-invariant hoisting — module docstring).
    """
    qvars = quantize_variables(variables, min_size=min_size)

    def apply_fn(images, **kw):
        return model.apply(dequantize_variables(qvars, dtype), images,
                           train=False, **kw)

    return apply_fn, qvars
