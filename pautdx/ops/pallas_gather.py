"""Pallas TPU kernel: one-hot MXU row gather for deformable attention.

The discrete (nearest) deformable sampling path reduces to "gather T rows
from a (L, C) table per batch item" (`ops/deformable.py`,
ms_deformable_attention_shared, method="discrete"). XLA lowers that to a
hardware gather with a ~fixed multi-ms per-op latency on TPU (measured in
round 1 — latency-bound, not bandwidth-bound, regardless of row bytes).

At D-FINE-nano serving sizes the whole level-concatenated value table is
tiny (2-level 640px: L=2000 rows x C=128 ch = 0.5 MB bf16), so this
kernel keeps it VMEM-resident and turns the gather into a one-hot matmul
on the MXU: rows = onehot(idx) @ table. Row selection by a 0/1 matrix is
EXACT in any dtype (each output row is a sum with one nonzero term), so
results match the XLA gather bit-for-bit.

The tap axis is tiled; consecutive grid steps over the same batch item
reuse the VMEM-resident table block (Pallas skips the refetch when the
block index map is unchanged between steps).

Falls back to interpret mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget guard for auto-dispatch: table + one-hot tile + out tile
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _gather_kernel(flat_ref, idx_ref, out_ref):
    l, c = flat_ref.shape[1:]
    tt = idx_ref.shape[1]
    idx = idx_ref[0]                                        # (TT, 1) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (tt, l), 1)
    oh = (iota == idx).astype(flat_ref.dtype)               # (TT, L) 0/1
    out_ref[0] = jax.lax.dot_general(
        oh, flat_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _pick_tile(t: int, want: int = 256) -> int:
    # Mosaic requires the second-to-last block dim divisible by 8 (or the
    # full dimension). Pick the largest divisor of t that is <= want AND a
    # multiple of 8; fall back to the full dimension (always legal).
    if t <= want:
        return t
    for tt in range(want, 7, -1):
        if t % tt == 0 and tt % 8 == 0:
            return tt
    return t


def _impl(flat: jnp.ndarray, idx: jnp.ndarray, tile_t: int,
          interpret) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L, C = flat.shape
    T = idx.shape[1]
    tt = tile_t or _pick_tile(T)
    if T % tt:
        # grid=(B, T // tt) would silently DROP the last T % tt taps,
        # leaving those output rows uninitialized; the tile is purely a
        # perf knob, so fall back to a legal divisor
        tt = _pick_tile(T)
    idx3 = jnp.clip(idx, 0, L - 1).astype(jnp.int32)[..., None]  # (B, T, 1)
    return pl.pallas_call(
        _gather_kernel,
        grid=(B, T // tt),
        in_specs=[
            pl.BlockSpec((1, L, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tt, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), flat.dtype),
        interpret=interpret,
    )(flat, idx3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_onehot_gather(flat: jnp.ndarray, idx: jnp.ndarray,
                         tile_t: int = 0,
                         interpret: bool = None) -> jnp.ndarray:
    """flat (B, L, C); idx (B, T) int32 in [0, L) -> (B, T, C) rows.

    Exact drop-in for ``flat[b, idx[b, t]]`` (XLA gather), computed as a
    one-hot matmul over the VMEM-resident table. Differentiable in
    ``flat`` (scatter-add backward in XLA — the serving path never takes
    it, but training with method="discrete" stays correct).
    """
    return _impl(flat, idx, tile_t, interpret)


def _fwd(flat, idx, tile_t, interpret):
    # fwd receives primal-order args; nondiff_argnums lead only in bwd
    return _impl(flat, idx, tile_t, interpret), (idx, flat.shape)


def _bwd(tile_t, interpret, res, g):
    idx, shape = res
    B, L, C = shape
    bi = jnp.broadcast_to(jnp.arange(B)[:, None], idx.shape)
    d_flat = jnp.zeros(shape, g.dtype).at[bi, idx].add(g)
    return (d_flat.astype(g.dtype), None)


pallas_onehot_gather.defvjp(_fwd, _bwd)


def fits_vmem(L: int, C: int, itemsize: int, tile_t: int = 256,
              T: int = None) -> bool:
    """Whether the one-hot formulation's working set fits the VMEM budget.

    Pass ``T`` (the tap count) to budget with the tile the kernel will
    ACTUALLY use — ``_pick_tile`` can fall back to the full T when no
    divisor that is a multiple of 8 exists, far beyond the default 256.
    """
    if T is not None:
        tile_t = _pick_tile(T)
    table = L * C * itemsize
    onehot = tile_t * L * itemsize
    out = tile_t * C * 4
    return table + onehot + out <= _VMEM_BUDGET_BYTES


def _weighted_kernel(flat_ref, idx_ref, w_ref, out_ref):
    l, c = flat_ref.shape[1:]
    tt, k = idx_ref.shape[1:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tt, l), 1)
    acc = None
    for j in range(k):
        idx_j = idx_ref[0, :, j].reshape(tt, 1)
        w_j = w_ref[0, :, j].reshape(tt, 1).astype(flat_ref.dtype)
        term = (iota == idx_j).astype(flat_ref.dtype) * w_j
        acc = term if acc is None else acc + term
    out_ref[0] = jax.lax.dot_general(
        acc, flat_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _weighted_impl(flat, idx, w, tile_t, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L, C = flat.shape
    T, K = idx.shape[1:]
    tt = tile_t or _pick_tile(T)
    idxc = jnp.clip(idx, 0, L - 1).astype(jnp.int32)
    return pl.pallas_call(
        _weighted_kernel,
        grid=(B, T // tt),
        in_specs=[
            pl.BlockSpec((1, L, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, K), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, K), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tt, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), flat.dtype),
        interpret=interpret,
    )(flat, idxc, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_weighted_gather(flat: jnp.ndarray, idx: jnp.ndarray,
                           w: jnp.ndarray, tile_t: int = 0,
                           interpret: bool = None) -> jnp.ndarray:
    """flat (B, L, C); idx (B, T, K) int32; w (B, T, K) weights ->
    (B, T, C) = sum_k w[..., k] * flat[b, idx[..., k]].

    Bilinear deformable sampling as ONE sparse-weight MXU matmul: the
    interpolation matrix has K nonzeros per row (K=4 corners), built
    in VMEM from idx/w, so bilinear costs the same HBM traffic and
    near-the-same MXU time as the discrete one-hot gather. Out-of-range
    corners are handled by the caller (zero weight + clamped index —
    grid_sample zeros-padding semantics). Differentiable in ``flat``
    and ``w``.
    """
    return _weighted_impl(flat, idx, w, tile_t, interpret)


def _wfwd(flat, idx, w, tile_t, interpret):
    return _weighted_impl(flat, idx, w, tile_t, interpret), (flat, idx, w)


def _wbwd(tile_t, interpret, res, g):
    flat, idx, w = res
    B, L, C = flat.shape
    T, K = idx.shape[1:]
    idx = jnp.clip(idx, 0, L - 1)
    bi = jnp.broadcast_to(jnp.arange(B)[:, None, None], idx.shape)
    # d_flat[b, idx_k] += w_k * g
    d_flat = jnp.zeros(flat.shape, g.dtype).at[bi, idx].add(
        w[..., None].astype(g.dtype) * g[:, :, None, :])
    # d_w[..., k] = <g, flat[idx_k]>
    rows = jnp.take_along_axis(
        flat.astype(g.dtype), idx.reshape(B, T * K)[..., None],
        axis=1).reshape(B, T, K, C)
    d_w = jnp.sum(rows * g[:, :, None, :], axis=-1).astype(w.dtype)
    return (d_flat.astype(flat.dtype), None, d_w)


pallas_weighted_gather.defvjp(_wfwd, _wbwd)
