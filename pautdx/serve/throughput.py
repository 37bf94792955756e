"""High-throughput streaming inference: device-side scan over micro-batches.

Serving-side analogue of an input stream: the host hands the device a slab
of ``(n_steps, batch, H, W, C)`` frames and ONE jit call scans the model
over the micro-batches on device (`lax.scan`). This amortizes *all*
per-dispatch overhead (host->device RPC, executable replay on tunneled
runtimes) across ``n_steps * batch`` frames — the pattern behind the
frames/sec/chip numbers in `bench.py`.

The scan carries a scalar so successive calls can also be chained for
honest timing.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def make_streaming_forward(apply_fn: Callable,
                           raw_uint8: bool = False) -> Callable:
    """apply_fn(images) -> (logits, boxes). Returns jitted
    ``stream(variables-free slab, carry) -> (logits_last, boxes_last, carry)``
    scanning over the leading axis.

    ``raw_uint8``: feed integer slabs STRAIGHT into ``apply_fn`` without
    the explicit dequantize — for models whose stem consumes uint8
    natively (``fold_uint8_stem``: the space-to-depth patchify moves
    1-byte elements and the 1/255 scale is pre-folded into the stem
    kernel). Cuts the dequantized-image HBM round-trip out of the
    serving graph entirely.
    """

    def stream(slab: jnp.ndarray, carry: jnp.ndarray):
        def body(c, images):
            x = images
            if jnp.issubdtype(x.dtype, jnp.integer) and not raw_uint8:
                # uint8 wire format (the deployment contract: B-scan
                # frames are 8-bit images): dequantize on device — 4x
                # less HBM traffic on the biggest tensor in the graph
                x = x.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
            if jnp.issubdtype(x.dtype, jnp.integer):
                # carry-chaining without leaving uint8
                x = x + (c * 0.0).astype(x.dtype)
            else:
                x = x + c * 0.0
            logits, boxes = apply_fn(x)
            return logits.astype(jnp.float32).mean().astype(c.dtype), \
                (logits, boxes)
        carry, (logits, boxes) = jax.lax.scan(body, carry, slab)
        return logits[-1], boxes[-1], carry

    return jax.jit(stream)


def fold_uint8_stem(variables, *, scale: float = 1.0 / 255.0,
                    stem_path: Tuple[str, ...] = (
                        "model.backbone.model", "patch_embedder", "proj",
                        "kernel")):
    """Fold the input dequantization scale into the stem's proj kernel.

    With a space-to-depth stem (``HGNetConfig.stem_s2d``) the patchify is
    exactly ``patches @ kernel``, so ``(u8 / 255) @ K == u8 @ (K / 255)``
    — folding the scale lets the serving graph consume RAW uint8 frames:
    the patch reshape/transpose moves 1-byte elements and the bf16
    convert fuses into the matmul operand load (no dequantized image in
    HBM). The stem's BatchNorm sees identical pre-norm activations, so
    outputs match the dequantize-first path up to bf16 rounding of the
    kernel scale.

    Returns a new variables pytree; raises KeyError (with the available
    keys) if the stem path is absent — e.g. a conv-stem config, which
    cannot consume uint8.
    """
    params = variables["params"]

    def rebuild(tree, path):
        if path[0] not in tree:
            raise KeyError(
                f"fold_uint8_stem: '{path[0]}' not found on path "
                f"{stem_path}; available: {sorted(tree.keys())[:12]} — "
                f"raw-uint8 serving requires the space-to-depth patchify "
                f"stem (HGNetConfig.stem_s2d)")
        new = dict(tree)
        if len(path) == 1:
            kernel = tree[path[0]]
            new[path[0]] = (kernel.astype(jnp.float32) * scale
                            ).astype(kernel.dtype)
        else:
            new[path[0]] = rebuild(tree[path[0]], path[1:])
        return new

    out = dict(variables)
    out["params"] = rebuild(params, list(stem_path))
    return out


def make_uint8_slab(shape: Tuple[int, ...], seed: int = 0) -> jnp.ndarray:
    """Random uint8 bench slab generated ON DEVICE.

    Host-side rng for multi-hundred-MB slabs takes minutes on weak hosts
    (and the upload pays relay bandwidth); `jax.random` does it in
    milliseconds and the timing is data-independent anyway. uint8 is the
    production wire format (frames ship as 8-bit images).
    """
    slab = jax.jit(lambda k: jax.random.randint(
        k, shape, 0, 256, dtype=jnp.int32).astype(jnp.uint8))(
        jax.random.PRNGKey(seed))
    jax.block_until_ready(slab)
    return slab


def prepatchify_uint8(frames, patch: int):
    """Host-side space-to-depth on the uint8 wire bytes.

    (..., H, W, C) -> (..., H/p, W/p, p*p*C), flattened in the
    ``(ki, kj, c)`` order `_S2DProj`'s transpose lowering produces — a
    model with ``stem_pre_patchified=True`` consumes the result with the
    SAME params and bit-identical outputs, while the device never runs
    the patch rearrangement (the top two HBM-copy ops of the 640px
    serving profile). A pure permutation of 1-byte elements: the host
    pays one memcpy-speed pass per frame during wire assembly, where the
    frame bytes are already being touched (the reference's pipeline
    decodes PNGs host-side at the same spot,
    `/root/reference/BscanBased/predict_frames.py`-style).

    Works on numpy or jax arrays; leading axes (steps, batch) pass
    through.
    """
    import numpy as np

    x = np.asarray(frames)
    *lead, H, W, C = x.shape
    if H % patch or W % patch:
        raise ValueError(f"H/W must be divisible by patch={patch}, "
                         f"got {H}x{W}")
    x = x.reshape(*lead, H // patch, patch, W // patch, patch, C)
    nd = x.ndim
    # (..., Hp, ki, Wp, kj, c) -> (..., Hp, Wp, ki, kj, c)
    x = x.transpose(*range(nd - 5), nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
    return np.ascontiguousarray(x).reshape(
        *lead, H // patch, W // patch, patch * patch * C)


def cast_params_bf16(variables):
    """Cast every f32 leaf of a variables tree to bf16, on device
    (the serving weight format; non-f32 leaves pass through)."""
    return jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t))(variables)


def measure_fps(stream_fn: Callable, slab: jnp.ndarray,
                n_calls: int = 3) -> float:
    """Chained + host-fetched throughput measurement."""
    import time

    n_steps, batch = slab.shape[0], slab.shape[1]
    cdtype = (jnp.bfloat16 if jnp.issubdtype(slab.dtype, jnp.integer)
              else slab.dtype)
    carry = jnp.zeros((), cdtype)
    _, _, carry = stream_fn(slab, carry)
    float(carry)                                  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n_calls):
        _, _, carry = stream_fn(slab, carry)
    float(carry)
    dt = time.perf_counter() - t0
    return n_steps * batch * n_calls / dt
