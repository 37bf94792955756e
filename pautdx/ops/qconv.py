"""Activation-side int8 convolution for the serving path.

The 640px D-FINE serving profile is HBM-bound (77% bandwidth utilization,
roofline ~7.9k fps at current traffic — PERF_INT8.json), and weight-only
int8 was a measured negative because weights are ~0.1% of per-frame
traffic. The remaining lever is the ACTIVATION traffic between the conv
ops of the backbone/neck: storing those intermediates as int8 halves
their HBM bytes.

Formulation: symmetric per-tensor input quantization (one calibrated
static scale per conv site — `pautdx.serve.quant` collects them) and
symmetric per-output-channel weight scales computed from the kernel at
trace time (loop-invariant: XLA hoists them out of the serving scan, so
the re-quantize costs nothing per step). The conv runs s8 x s8 -> s32 on
the MXU (int8 peak on v5e is 2x bf16), and the dequant + BatchNorm + act
chain fuses into the conv epilogue. The quantize-at-the-consumer op
likewise fuses backward into the PRODUCER's epilogue, so the tensor that
actually lands in HBM between two conv sites is the int8 one.

This mirrors the serving role of the reference's ONNX-Runtime int8
deployment option for its exported models (SURVEY.md §0 export path);
the reference itself never quantizes, so accuracy parity is gated
against OUR bf16 numbers (tools/bench_accuracy.py), not a reference
artifact.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Padding = Union[str, Tuple[Tuple[int, int], Tuple[int, int]]]


def int8_conv(x: jnp.ndarray, kernel: jnp.ndarray, *,
              strides: Tuple[int, int], padding: Padding, groups: int,
              in_scale: jnp.ndarray) -> jnp.ndarray:
    """s8 x s8 -> s32 NHWC conv with static input scale, per-channel
    weight scales, dequantized output in ``promote(x, kernel)`` dtype.

    ``in_scale`` is the calibrated per-tensor scale (absmax / 127). The
    input quantize is elementwise, so XLA fuses it into whatever fusion
    PRODUCED ``x`` — the int8 tensor is what crosses HBM. Weight scales
    are derived from the kernel inside the trace; by construction
    ``|k| / w_scale <= 127`` so the round never clips.
    """
    out_dtype = jnp.promote_types(x.dtype, kernel.dtype)
    s = jnp.asarray(in_scale, jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                  -127.0, 127.0).astype(jnp.int8)
    kf = kernel.astype(jnp.float32)
    w_absmax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))          # (features,)
    w_scale = jnp.maximum(w_absmax, 1e-12) / 127.0
    kq = jnp.round(kf / w_scale).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, kq, strides, padding,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s * w_scale)).astype(out_dtype)


def shared_conv_kernel(mod: nn.Module, name: str) -> jnp.ndarray:
    """Read the conv kernel param created by the dense ``nn.Conv`` path.

    The int8 branch needs the raw kernel, but the param belongs to the
    ``nn.Conv`` submodule (path "<name>/kernel"). Reading it through
    ``mod.variables`` returns the stored value without flax's
    param-recreation machinery (declaring a second param at the same
    path would re-run shape validation against a fresh initializer).
    ``wants_int8`` only returns True when this path exists, so the
    lookup cannot KeyError on a fresh init."""
    return mod.variables["params"][name]["kernel"]


def sow_calibration(mod: nn.Module, x: jnp.ndarray) -> None:
    """Record ``max|x|`` of a conv input under the "calib" collection.

    No-op unless the caller passed ``mutable=["calib"]`` to apply(); the
    guard also keeps init() from baking a calib collection into fresh
    variables. Repeated batches reduce by maximum, so one mutable
    variables dict threaded through a calibration loop accumulates the
    running absmax (see pautdx.serve.quant.calibrate_int8).
    """
    if mod.is_mutable_collection("calib") and not mod.is_initializing():
        mod.sow("calib", "in_absmax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.zeros((), jnp.float32))


def wants_int8(mod: nn.Module, train: bool, conv_name: str) -> bool:
    """Whether this conv site should take the int8 path: inference only,
    a calibrated scale for the site present, and the dense conv's kernel
    param already created. The last condition makes init() with a stray
    "quant" collection safe: params don't exist yet, so the dense branch
    runs and creates them normally (the quant scales are simply unused
    at init — they only ever affect apply)."""
    if train or mod.is_initializing():
        return False
    if not mod.has_variable("quant", "in_scale"):
        return False
    params = mod.variables.get("params", {})
    return conv_name in params and "kernel" in params[conv_name]
