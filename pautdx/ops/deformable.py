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

import jax.numpy as jnp


def bilinear_sample_nhwc(value: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                         ) -> jnp.ndarray:
    """Zero-padded bilinear sampling.

    value: (B, H, W, C); x, y: (B, ...) pixel coordinates (center-aligned,
    i.e. x = x_norm * W - 0.5). Returns (B, ..., C).
    """
    B, H, W, C = value.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        valid = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        b_idx = jnp.arange(B).reshape((B,) + (1,) * (x.ndim - 1))
        v = value[b_idx, yc, xc]
        return v * valid[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)


def ms_deformable_attention(value_levels: List[jnp.ndarray],
                            sampling_locations: jnp.ndarray,
                            attention_weights: jnp.ndarray,
                            num_points_list: Sequence[int]) -> jnp.ndarray:
    """value_levels: list of (B, H_l, W_l, n_heads, head_dim);
    sampling_locations: (B, Q, n_heads, sum_points, 2) normalized [0, 1];
    attention_weights: (B, Q, n_heads, sum_points) softmaxed.
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
        loc_bh = jnp.moveaxis(loc, 2, 1).reshape(B * n_heads, Q, P, 2)
        x = loc_bh[..., 0] * W - 0.5
        y = loc_bh[..., 1] * H - 0.5
        s = bilinear_sample_nhwc(v, x, y)            # (B*h, Q, P, d)
        s = jnp.moveaxis(s.reshape(B, n_heads, Q, P, head_dim), 1, 2)
        sampled.append(s)                            # (B, Q, h, P, d)
        offset += P
    samples = jnp.concatenate(sampled, axis=3)       # (B, Q, h, sum_P, d)
    out = jnp.sum(samples * attention_weights[..., None], axis=3)
    return out.reshape(B, Q, n_heads * head_dim)
