"""Pallas TPU kernel: fused YOLO-seg prototype mask decode.

``assemble_masks`` (models/vision/yolo.py) is three HBM round-trips when
left to XLA at serving batch sizes: the (B, Hp*Wp, P) x (B, P, K) einsum,
the sigmoid, and the box-crop multiply each materialize a (B, K, Hp, Wp)
intermediate. This kernel fuses all three in one pass: each grid step
loads a (TH, Wp, P) proto tile into VMEM, runs the (K, P) x (P, TH*Wp)
matmul on the MXU, applies sigmoid + the box window on the VPU, and
writes the finished mask tile once. HBM traffic drops to reads of
protos/coeffs/boxes plus a single write of the output.

Mosaic cannot split the minor (lane) dim in a reshape, so the kernel
keeps masks flat as (K, TH*Wp) — row-major spatial tiles are contiguous
in the flattened (Hp*Wp) axis, so the output is blocked along that flat
axis and reshaped to (B, K, Hp, Wp) outside the kernel (free in XLA).

Replaces the reference's Ultralytics mask path
(`BscanBased/yolo8_seg_predict.py:3-9`, which delegates to torch CUDA).
Falls back to interpret mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mask_kernel(protos_ref, coeffs_ref, boxes_ref, out_ref, *, tile_h: int):
    th, wp, p = protos_ref.shape[1:]
    k = coeffs_ref.shape[1]
    h0 = (pl.program_id(1) * tile_h).astype(jnp.float32)

    pr = protos_ref[0].reshape(th * wp, p)                  # (TH*Wp, P)
    cf = coeffs_ref[0]                                      # (K, P)
    # (K, TH*Wp) on the MXU; contract P without materializing a transpose
    m = jax.lax.dot_general(cf, pr, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = jax.nn.sigmoid(m)

    # flat spatial index -> (row, col); Mosaic iota must be integer
    flat = jax.lax.broadcasted_iota(jnp.int32, (k, th * wp), 1)
    rows = (flat // wp).astype(jnp.float32) + h0
    cols = (flat % wp).astype(jnp.float32)
    b = boxes_ref[0]                                        # (K, 4) proto px
    x1 = b[:, 0].reshape(k, 1)
    y1 = b[:, 1].reshape(k, 1)
    x2 = b[:, 2].reshape(k, 1)
    y2 = b[:, 3].reshape(k, 1)
    inside = ((cols >= x1) & (cols < x2) & (rows >= y1) & (rows < y2))
    out_ref[0] = jnp.where(inside, m, 0.0)


def _pick_tile(hp: int, want: int = 16) -> int:
    t = min(want, hp)
    while hp % t:
        t -= 1
    return t


@functools.partial(jax.jit,
                   static_argnames=("img_size", "tile_h", "interpret"))
def pallas_assemble_masks(protos: jnp.ndarray, coeffs: jnp.ndarray,
                          boxes: jnp.ndarray, img_size: Tuple[int, int],
                          tile_h: int = 0,
                          interpret: bool = None) -> jnp.ndarray:
    """Drop-in replacement for ``assemble_masks``: same contract.

    protos (B, Hp, Wp, P); coeffs (B, K, P); boxes (B, K, 4) in image px.
    Returns (B, K, Hp, Wp) float32 masks in [0, 1], zero outside boxes.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Hp, Wp, P = protos.shape
    K = coeffs.shape[1]
    H, W = img_size
    scale = jnp.asarray([Wp / W, Hp / H, Wp / W, Hp / H], jnp.float32)
    pboxes = boxes.astype(jnp.float32) * scale

    th = tile_h or _pick_tile(Hp)
    grid = (B, Hp // th)
    flat = pl.pallas_call(
        functools.partial(_mask_kernel, tile_h=th),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, Wp, P), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, P), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 4), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, th * Wp), lambda b, h: (b, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, Hp * Wp), jnp.float32),
        interpret=interpret,
    )(protos.astype(jnp.float32), coeffs.astype(jnp.float32), pboxes)
    return flat.reshape(B, K, Hp, Wp)
