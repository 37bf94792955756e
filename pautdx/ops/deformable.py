"""Multi-scale deformable attention sampling (XLA gather formulation).

The core op of the D-FINE decoder's cross-attention (reference dependency:
HF `multi_scale_deformable_attention_v2`, torch `grid_sample`). TPU-native
formulation: per level, the bilinear sample of each (query, head, point)
location becomes four gathers + a weighted sum — XLA fuses this into a
single gather-heavy program; there is no dynamic shape anywhere.

Semantics match torch ``grid_sample(align_corners=False, padding_mode=
"zeros")`` with normalized [0, 1] sampling locations (the HF code maps
loc -> 2*loc-1 before grid_sample; we fold that in).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def bilinear_sample_nhwc(value: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                         ) -> jnp.ndarray:
    """Zero-padded bilinear sampling via ONE gather of 2x2 windows.

    value: (B, H, W, C); x, y: (B, ...) pixel coordinates (center-aligned,
    i.e. x = x_norm * W - 0.5). Returns (B, ..., C).

    TPU note: an XLA gather costs roughly a full scan of the operand per
    *op*, so the four bilinear corners are fetched with a single gather of
    (1, 2, 2, C) slices instead of four separate corner gathers — measured
    ~4x faster at D-FINE sizes. The interpolation weights are computed in
    the value dtype so bf16 values stay bf16 end to end.
    """
    B, H, W, C = value.shape
    batch_shape = x.shape[1:]
    n = 1
    for s in batch_shape:
        n *= s
    x = x.reshape(B, n)
    y = y.reshape(B, n)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f).astype(value.dtype)
    wy = (y - y0f).astype(value.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    # pad by 1 on each side: out-of-range taps read zeros instead of being
    # masked per corner (grid_sample zeros-padding semantics)
    vp = jnp.pad(value, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = jnp.clip(x0 + 1, 0, W + 1 - 1)   # clamp into padded range, start
    ys = jnp.clip(y0 + 1, 0, H + 1 - 1)
    # fully-out-of-range taps (beyond pad) get zero weight
    in_x0 = (x0 >= -1) & (x0 <= W - 1)
    in_x1 = (x0 + 1 >= 0) & (x0 + 1 <= W)
    in_y0 = (y0 >= -1) & (y0 <= H - 1)
    in_y1 = (y0 + 1 >= 0) & (y0 + 1 <= H)

    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, n))
    starts = jnp.stack([b_idx, ys, xs], axis=-1).reshape(B * n, 3)
    patches = jax.lax.gather(
        vp, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2)),
        slice_sizes=(1, 2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(B, n, 2, 2, C)

    w00 = ((1 - wx) * (1 - wy) * in_x0 * in_y0)[..., None]
    w01 = (wx * (1 - wy) * in_x1 * in_y0)[..., None]
    w10 = ((1 - wx) * wy * in_x0 * in_y1)[..., None]
    w11 = (wx * wy * in_x1 * in_y1)[..., None]
    out = (patches[:, :, 0, 0] * w00 + patches[:, :, 0, 1] * w01
           + patches[:, :, 1, 0] * w10 + patches[:, :, 1, 1] * w11)
    return out.reshape((B,) + batch_shape + (C,))


def nearest_sample_nhwc(value: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                        ) -> jnp.ndarray:
    """Nearest-neighbour sampling — HF D-FINE's ``discrete`` decoder mode
    (`multi_scale_deformable_attention_v2` method="discrete"): coordinates
    ``(x_norm * W + 0.5)`` floored and clamped. One tap per point: 4x fewer
    gather rows than bilinear — the fast serving mode on TPU.

    Takes the same center-aligned pixel coords as bilinear_sample_nhwc
    (x = x_norm * W - 0.5), so +1.0 recovers the discrete convention.
    """
    B, H, W, C = value.shape
    batch_shape = x.shape[1:]
    n = 1
    for s in batch_shape:
        n *= s
    xi = jnp.clip((x + 1.0).astype(jnp.int32), 0, W - 1).reshape(B, n)
    yi = jnp.clip((y + 1.0).astype(jnp.int32), 0, H - 1).reshape(B, n)
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, n))
    starts = jnp.stack([b_idx, yi, xi], axis=-1).reshape(B * n, 3)
    rows = jax.lax.gather(
        value, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,),
            collapsed_slice_dims=(0, 1, 2),
            start_index_map=(0, 1, 2)),
        slice_sizes=(1, 1, 1, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return rows.reshape((B,) + batch_shape + (C,))


def _bilinear_fits(value_levels, C: int, T: int = None) -> bool:
    from pautdx.ops.pallas_gather import fits_vmem

    L = sum(v.shape[1] * v.shape[2] for v in value_levels)
    return fits_vmem(L, C, jnp.dtype(value_levels[0].dtype).itemsize, T=T)


def ms_deformable_attention_shared(value_levels: List[jnp.ndarray],
                                   sampling_locations: jnp.ndarray,
                                   attention_weights: jnp.ndarray,
                                   num_points_list: Sequence[int],
                                   method: str = "default") -> jnp.ndarray:
    """Head-SHARED sampling points: all heads read the same (x, y) per
    point; per-head attention weights still mix them independently.

    TPU rationale: XLA gathers are bound by the number of gathered rows,
    not bytes (measured: 38400x128ch rows gather FASTER than 38400x16ch
    — full-lane 256B rows), so sharing locations across the 8 heads cuts
    deformable-attention time ~8x. This is the ``dfine_nano`` serving
    preset's mode (a pautdx-native preset with no HF checkpoint to
    match); the HF-parity configs keep per-head points via
    ``ms_deformable_attention``.

    value_levels: list of (B, H_l, W_l, n_heads, head_dim);
    sampling_locations: (B, Q, sum_points, 2) normalized [0, 1] — NO head
    axis; attention_weights: (B, Q, n_heads, sum_points) softmaxed.
    Returns (B, Q, n_heads * head_dim).
    """
    B, Q, total_points, _ = sampling_locations.shape
    n_heads, head_dim = value_levels[0].shape[3], value_levels[0].shape[4]
    C = n_heads * head_dim
    if method == "discrete":
        # ONE gather across ALL levels: nearest-mode taps are single rows,
        # so every level's (H, W) grid flattens into one (sum HW, C) table
        # and per-level flat indices (+ level offset) address it. XLA
        # gathers carry a ~fixed per-op latency — collapsing L levels into
        # one op is a direct ~Lx cut of that latency per decoder layer.
        flat = jnp.concatenate(
            [v.reshape(B, -1, C) for v in value_levels], axis=1)
        flat = jax.lax.optimization_barrier(flat)
        idx_parts = []
        offset = 0
        base = 0
        for lvl, value in enumerate(value_levels):
            P = num_points_list[lvl]
            H, W = value.shape[1:3]
            loc = sampling_locations[:, :, offset:offset + P, :]
            # HF discrete: floor(loc * size + 0.5), clamped into the grid
            xi = jnp.clip((loc[..., 0] * W + 0.5).astype(jnp.int32), 0, W - 1)
            yi = jnp.clip((loc[..., 1] * H + 0.5).astype(jnp.int32), 0, H - 1)
            idx_parts.append(yi * W + xi + base)
            offset += P
            base += H * W
        idx = jnp.concatenate(idx_parts, axis=2)     # (B, Q, sum_P)
        L = flat.shape[1]
        from pautdx.ops.pallas_gather import fits_vmem, pallas_onehot_gather

        if jax.default_backend() == "tpu" and fits_vmem(
                L, C, jnp.dtype(flat.dtype).itemsize,
                T=Q * total_points):
            # VMEM-resident one-hot MXU gather: avoids the ~fixed multi-ms
            # per-op latency of the XLA hardware gather (exact same rows)
            rows = pallas_onehot_gather(
                flat, idx.reshape(B, Q * total_points))
        else:
            b_idx = jnp.broadcast_to(
                jnp.arange(B, dtype=jnp.int32)[:, None],
                (B, Q * total_points))
            starts = jnp.stack(
                [b_idx, idx.reshape(B, Q * total_points)], -1
            ).reshape(B * Q * total_points, 2)
            rows = jax.lax.gather(
                flat, starts,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0, 1),
                    start_index_map=(0, 1)),
                slice_sizes=(1, 1, C),
                mode=jax.lax.GatherScatterMode.CLIP,
            )
        samples = rows.reshape(B, Q, total_points, n_heads, head_dim)
    elif method == "default" and jax.default_backend() == "tpu" and _bilinear_fits(
            value_levels, n_heads * head_dim, T=Q * total_points):
        # bilinear sampling as ONE sparse-weight MXU matmul over the
        # VMEM-resident level-concat table: each tap row carries its 4
        # corner weights (ops/pallas_gather.pallas_weighted_gather) —
        # bilinear quality at the discrete gather's cost.
        from pautdx.ops.pallas_gather import pallas_weighted_gather

        flat = jnp.concatenate(
            [v.reshape(B, -1, C) for v in value_levels], axis=1)
        flat = jax.lax.optimization_barrier(flat)
        idx_parts, w_parts = [], []
        offset = 0
        base = 0
        for lvl, value in enumerate(value_levels):
            P = num_points_list[lvl]
            H, W = value.shape[1:3]
            loc = sampling_locations[:, :, offset:offset + P, :]
            x = loc[..., 0] * W - 0.5
            y = loc[..., 1] * H - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = (x - x0).astype(jnp.float32)
            fy = (y - y0).astype(jnp.float32)
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            corners = []
            weights = []
            for dy, dx, wgt in ((0, 0, (1 - fx) * (1 - fy)),
                                (0, 1, fx * (1 - fy)),
                                (1, 0, (1 - fx) * fy),
                                (1, 1, fx * fy)):
                xi = x0i + dx
                yi = y0i + dy
                inb = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
                # zeros-padding semantics: out-of-range corner -> weight 0
                corners.append(jnp.clip(yi, 0, H - 1) * W
                               + jnp.clip(xi, 0, W - 1) + base)
                weights.append(jnp.where(inb, wgt, 0.0))
            idx_parts.append(jnp.stack(corners, axis=-1))   # (B,Q,P,4)
            w_parts.append(jnp.stack(weights, axis=-1))
            offset += P
            base += H * W
        idx = jnp.concatenate(idx_parts, axis=2).reshape(
            B, Q * total_points, 4)
        wts = jnp.concatenate(w_parts, axis=2).reshape(
            B, Q * total_points, 4)
        rows = pallas_weighted_gather(flat, idx, wts)
        samples = rows.reshape(B, Q, total_points, n_heads, head_dim)
    else:
        offset = 0
        sampled = []
        for lvl, value in enumerate(value_levels):
            P = num_points_list[lvl]
            H, W = value.shape[1:3]
            # heads stay fused in the channel axis: one 256-byte row per tap
            v = value.reshape(B, H, W, C)
            v = jax.lax.optimization_barrier(v)
            loc = sampling_locations[:, :, offset:offset + P, :]
            x = loc[..., 0] * W - 0.5
            y = loc[..., 1] * H - 0.5
            s = bilinear_sample_nhwc(v, x, y)        # (B, Q, P, h*d)
            sampled.append(s.reshape(B, Q, P, n_heads, head_dim))
            offset += P
        samples = jnp.concatenate(sampled, axis=2)   # (B, Q, sum_P, h, d)
    w = jnp.moveaxis(attention_weights, 2, 3)[..., None]  # (B, Q, sum_P, h, 1)
    out = jnp.sum(samples * w.astype(samples.dtype), axis=2)
    return out.reshape(B, Q, n_heads * head_dim)


def ms_deformable_attention(value_levels: List[jnp.ndarray],
                            sampling_locations: jnp.ndarray,
                            attention_weights: jnp.ndarray,
                            num_points_list: Sequence[int],
                            method: str = "default") -> jnp.ndarray:
    """value_levels: list of (B, H_l, W_l, n_heads, head_dim);
    sampling_locations: (B, Q, n_heads, sum_points, 2) normalized [0, 1];
    attention_weights: (B, Q, n_heads, sum_points) softmaxed.
    method: "default" (bilinear) | "discrete" (nearest, 4x fewer taps).
    Returns (B, Q, n_heads * head_dim).
    """
    B, Q, n_heads, total_points, _ = sampling_locations.shape
    head_dim = value_levels[0].shape[-1]
    offset = 0
    sampled = []
    for lvl, value in enumerate(value_levels):
        P = num_points_list[lvl]
        loc = sampling_locations[:, :, :, offset:offset + P, :]
        H, W = value.shape[1:3]
        # fold heads into the batch axis: one gather per level
        v = jnp.moveaxis(value, 3, 1).reshape(B * n_heads, H, W, head_dim)
        # barrier: stop XLA from hoisting downstream f32 converts INTO the
        # gather operand (convert(gather(x)) -> gather(convert(x)) doubles
        # the gathered bytes — measured 2x slower at D-FINE sizes)
        v = jax.lax.optimization_barrier(v)
        loc_bh = jnp.moveaxis(loc, 2, 1).reshape(B * n_heads, Q, P, 2)
        x = loc_bh[..., 0] * W - 0.5
        y = loc_bh[..., 1] * H - 0.5
        sample = (nearest_sample_nhwc if method == "discrete"
                  else bilinear_sample_nhwc)
        s = sample(v, x, y)                          # (B*h, Q, P, d)
        s = jnp.moveaxis(s.reshape(B, n_heads, Q, P, head_dim), 1, 2)
        sampled.append(s)                            # (B, Q, h, P, d)
        offset += P
    samples = jnp.concatenate(sampled, axis=3)       # (B, Q, h, sum_P, d)
    out = jnp.sum(samples * attention_weights[..., None], axis=3)
    return out.reshape(B, Q, n_heads * head_dim)
