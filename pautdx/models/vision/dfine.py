"""D-FINE detector in JAX — hybrid encoder + deformable decoder + FDR head.

Architecture-exact re-implementation of the HF D-FINE the reference drives
(`D-Fine/dfine_nano_coco.py`, `temporal_dfine.py` — SURVEY.md §2.2):

- HGNetV2 backbone (``pautdx.models.vision.hgnet``)
- hybrid encoder: AIFI transformer on the last level (2D sin-cos position
  embedding) + top-down FPN / bottom-up PAN with RepNCSPELAN4 blocks
- two-stage query selection: dense per-anchor class/box heads over the
  flattened memory, top-k anchors become decoder queries
- decoder: self-attention + multi-scale deformable cross-attention (the
  sampling op in ``pautdx.ops.deformable``), gated fusion, and
  **fine-grained distribution refinement** — per-layer corner
  distributions integrated against the non-uniform ``weighting_function``
  and decoded by ``distance2bbox`` (closed forms verified by the
  reference's own probe, `D-Fine/dfine_inner_check.py:24-53`)
- LQE: location-quality estimates added to class logits.

Flax module names mirror the torch tree so
``pautdx.compat.dfine_import.import_dfine`` converts HF checkpoints
mechanically; parity is tested against a randomly-initialized torch
D-FINE in `tests/test_dfine_parity.py`.

TPU notes: everything static-shape (fixed num_queries, fixed levels); the
decoder loop is a Python loop over a static layer count, fully unrolled
and fused by XLA. bf16-friendly: matmuls dominate (AIFI + decoder).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pautdx.models.vision.hgnet import HGNetConfig, HGNetV2
from pautdx.ops.deformable import (
    ms_deformable_attention, ms_deformable_attention_shared,
)
from pautdx.ops.qconv import (
    int8_conv, shared_conv_kernel, sow_calibration, wants_int8,
)


@dataclasses.dataclass(frozen=True)
class DFineConfig:
    num_labels: int = 2
    d_model: int = 256
    num_queries: int = 300
    decoder_layers: int = 6
    decoder_attention_heads: int = 8
    decoder_ffn_dim: int = 1024
    decoder_n_points: int = 4
    decoder_offset_scale: float = 0.5
    num_feature_levels: int = 3
    encoder_hidden_dim: int = 256
    encoder_layers: int = 1
    encoder_attention_heads: int = 8
    encoder_ffn_dim: int = 1024
    hidden_expansion: float = 1.0
    depth_mult: float = 1.0
    max_num_bins: int = 32
    reg_scale: float = 4.0
    up: float = 0.5
    top_prob_values: int = 4
    lqe_hidden_dim: int = 64
    feat_strides: Tuple[int, ...] = (8, 16, 32)
    anchor_grid_size: float = 0.05
    backbone: HGNetConfig = HGNetConfig()
    eval_idx: int = -1
    decoder_method: str = "default"     # default (bilinear) | discrete
    # training-recipe knobs (HF DFineConfig defaults are all 0.0, so the
    # parity configs are unchanged; recipes may turn these on)
    dropout: float = 0.0                # residual dropout in enc/dec layers
    attention_dropout: float = 0.0      # on attention weights
    activation_dropout: float = 0.0     # inside FFNs
    # share deformable sampling points across heads (per-head weights
    # remain): ~8x fewer gather rows on TPU. pautdx-native presets only —
    # breaks HF checkpoint parity.
    decoder_shared_points: bool = False
    # query selection top-k: "exact" (sort-based, HF parity) or "approx"
    # (TPU-native jax.lax.approx_max_k — avoids a full sort over all
    # anchors; selection is a heuristic, so approximate recall is free)
    query_topk: str = "exact"
    # AIFI FFN gelu: False = exact erf (HF torch parity; XLA lowers erf
    # as an f32 custom call, upcasting the whole bf16 FFN — measured
    # ~0.6 ms/iter at 640px b32), True = tanh approximation (stays bf16,
    # MXU-adjacent elementwise only). pautdx-native presets use True.
    encoder_act_approx: bool = False
    # AIFI self-attention as a fused Pallas kernel (serving only): the
    # (B, h, N, N) score tensor stays in VMEM instead of round-tripping
    # HBM (~327 MB/iter at 640px b128). Inference path only; training
    # keeps the einsum chain (see TorchMHA.fused).
    encoder_fused_attn: bool = False

    def __post_init__(self):
        if self.encoder_hidden_dim != self.d_model:
            # the memory flatten + deformable value split assume the
            # encoder emits d_model channels (HF ties them via lateral
            # 1x1s; this implementation ties the config). Fail here with
            # a clear message, not a broadcast error deep in __call__.
            raise ValueError(
                f"encoder_hidden_dim ({self.encoder_hidden_dim}) must "
                f"equal d_model ({self.d_model}) in this implementation")
        if self.d_model % self.decoder_attention_heads:
            raise ValueError(
                f"d_model {self.d_model} not divisible by "
                f"decoder_attention_heads {self.decoder_attention_heads}")

    @property
    def head_dim(self) -> int:
        return self.d_model // self.decoder_attention_heads

    @property
    def num_points_list(self) -> List[int]:
        return [self.decoder_n_points] * self.num_feature_levels


def dfine_nano(num_labels: int = 2, tpu_stem: bool = True,
               levels: int = 2, stride8_stem: bool = True) -> DFineConfig:
    """Small preset in the spirit of D-FINE-N: shallow decoder, slim dims.

    pautdx-native preset (no HF checkpoint to match), so the backbone uses
    a patchify stem by default — ``stride8_stem=True`` (default) is one
    k8/s8 conv straight to stride 8, skipping the narrow-channel
    160x160/80x80 stages entirely (measured +40% serving fps at 640px
    b64: 4300 -> 6050). ``stride8_stem=False`` keeps the k4/s4 stem +
    full stage chain; ``tpu_stem=False`` the HGNet dual-path stem.

    ``levels=2`` (default) drops the stride-8 FPN level: the model is
    HBM-bandwidth bound and the 80x80 neck/deformable level is ~40% of
    the per-frame traffic at 640px, while PAUT defects are large blobs
    that a 16px grid localizes fine. Quality for the exact serving
    preset is measured, not asserted: tools/bench_accuracy.py trains it
    and evaluates mAP@0.5 (BENCH_ACCURACY.json). ``levels=3`` restores
    the full HF-style pyramid — that needs the stage-1 stride-8 feature,
    so the stride-8 patchify stem (which skips stages 0-1) is
    incompatible and is disabled automatically.
    """
    if levels == 3:
        stride8_stem = False    # stage 1 must run to feed the stride-8 level
    strides = (8, 16, 32)[3 - levels:]
    return DFineConfig(
        num_labels=num_labels, d_model=128, encoder_hidden_dim=128,
        decoder_layers=3, decoder_ffn_dim=512, encoder_ffn_dim=512,
        # 150 queries: deformable gathers are tap-latency-bound on TPU and
        # PAUT B-scans carry <=8 objects — half the taps of DETR's 300 at
        # no practical recall cost for this domain
        num_queries=150,
        # head-shared sampling points: gathers are row-count-bound, so
        # one 256-byte row per point instead of 8x 32-byte rows (~8x
        # fewer taps; per-head attention weights unchanged)
        decoder_shared_points=True,
        query_topk="approx",
        encoder_act_approx=True,
        num_feature_levels=levels, feat_strides=strides,
        backbone=HGNetConfig(
            stem=("patchify8" if stride8_stem
                  else "patchify" if tpu_stem else "hgnet"),
            # space-to-depth lowering of the patch conv: measured +3.2%
            # serving fps at 640px b64 (kills the conv input relayout);
            # params are interchangeable with the conv lowering
            stem_s2d=tpu_stem or stride8_stem,
            start_stage=2 if stride8_stem else 0,
            out_indices=tuple(range(4 - levels, 4))),
    )


def config_to_dict(cfg: DFineConfig) -> Dict[str, Any]:
    """JSON-serializable dict of a DFineConfig (checkpoint metadata).

    Persisted alongside checkpoints so restore paths rebuild the exact
    architecture instead of relying on current preset defaults (which may
    evolve — e.g. the nano preset's levels/stem knobs)."""
    return dataclasses.asdict(cfg)


def config_from_dict(d: Dict[str, Any]) -> DFineConfig:
    """Inverse of :func:`config_to_dict` (tolerates JSON list/tuple loss)."""
    d = dict(d)
    bb = dict(d.pop("backbone", {}))
    for k, v in list(bb.items()):
        if isinstance(v, list):
            bb[k] = tuple(v)
    for k, v in list(d.items()):
        if isinstance(v, list):
            d[k] = tuple(v)
    return DFineConfig(backbone=HGNetConfig(**bb), **d)


# ---------------------------------------------------------------------------
# closed forms (reference oracle: D-Fine/dfine_inner_check.py:32-47)


def weighting_function(max_num_bins: int, up: float, reg_scale: float
                       ) -> jnp.ndarray:
    """Non-uniform FDR bin values W(n), length max_num_bins + 1."""
    up, reg_scale = abs(up), abs(reg_scale)
    ub1 = up * reg_scale
    ub2 = up * reg_scale * 2
    step = (ub1 + 1) ** (2 / (max_num_bins - 2))
    left = [-(step ** i) + 1 for i in range(max_num_bins // 2 - 1, 0, -1)]
    right = [step ** i - 1 for i in range(1, max_num_bins // 2)]
    values = [-ub2] + left + [0.0] + right + [ub2]
    return jnp.asarray(values, jnp.float32)


def integral(pred_corners: jnp.ndarray, project: jnp.ndarray,
             max_num_bins: int) -> jnp.ndarray:
    """softmax over bins -> expected distance per side: (..., 4)."""
    shape = pred_corners.shape[:-1]
    p = nn.softmax(pred_corners.reshape(shape + (4, max_num_bins + 1)),
                   axis=-1)
    return jnp.einsum("...b,b->...", p, project)


def distance2bbox(points: jnp.ndarray, distance: jnp.ndarray,
                  reg_scale: float) -> jnp.ndarray:
    """(cx, cy, w, h) refs + ltrb distances -> refined (cx, cy, w, h)."""
    reg_scale = abs(reg_scale)
    x1 = points[..., 0] - (0.5 * reg_scale + distance[..., 0]) * (points[..., 2] / reg_scale)
    y1 = points[..., 1] - (0.5 * reg_scale + distance[..., 1]) * (points[..., 3] / reg_scale)
    x2 = points[..., 0] + (0.5 * reg_scale + distance[..., 2]) * (points[..., 2] / reg_scale)
    y2 = points[..., 1] + (0.5 * reg_scale + distance[..., 3]) * (points[..., 3] / reg_scale)
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps) / jnp.clip(1.0 - x, eps))


def sincos_position_embedding(width: int, height: int, embed_dim: int,
                              temperature: float = 10000.0) -> np.ndarray:
    """2D sin-cos embedding, width-major grid (HF build_2d_sincos...)."""
    grid_w, grid_h = np.meshgrid(np.arange(width, dtype=np.float32),
                                 np.arange(height, dtype=np.float32),
                                 indexing="ij")
    pos_dim = embed_dim // 4
    omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
    out_w = grid_w.flatten()[:, None] @ omega[None]
    out_h = grid_h.flatten()[:, None] @ omega[None]
    return np.concatenate(
        [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
    )[None]


# ---------------------------------------------------------------------------
# building blocks (names mirror torch)


class ConvNorm(nn.Module):
    """conv (no bias) + BN + optional act; torch DFineConvNormLayer."""

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: Optional[str] = None
    padding: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2 if self.padding is None else self.padding
        sow_calibration(self, x)
        if wants_int8(self, train, "conv"):
            # activation-int8 serving (pautdx.serve.quantize): same kernel
            # param, s8 x s8 -> s32 conv, calibrated per-tensor input scale
            kernel = shared_conv_kernel(self, "conv")
            x = int8_conv(x, kernel, strides=(self.stride, self.stride),
                          padding=((p, p), (p, p)), groups=self.groups,
                          in_scale=self.get_variable("quant", "in_scale"))
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((p, p), (p, p)), use_bias=False,
                        feature_group_count=self.groups, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="norm")(x)
        if self.act == "silu":
            x = nn.silu(x)
        elif self.act == "relu":
            x = nn.relu(x)
        elif self.act == "gelu":
            x = nn.gelu(x)
        return x


class RepVggBlock(nn.Module):
    features: int
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvNorm(self.features, 3, padding=1, name="conv1")(x, train) + \
            ConvNorm(self.features, 1, padding=0, name="conv2")(x, train)
        return nn.silu(y) if self.act == "silu" else nn.relu(y)


class CSPRepLayer(nn.Module):
    features: int
    num_blocks: int = 3
    expansion: float = 1.0
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        h1 = ConvNorm(hidden, 1, act=self.act, name="conv1")(x, train)
        for i in range(self.num_blocks):
            h1 = RepVggBlock(hidden, self.act, name=f"bottlenecks.{i}")(h1, train)
        h2 = ConvNorm(hidden, 1, act=self.act, name="conv2")(x, train)
        h = h1 + h2
        if hidden != self.features:
            h = ConvNorm(self.features, 1, act=self.act, name="conv3")(h, train)
        return h


class RepNCSPELAN4(nn.Module):
    cfg: DFineConfig
    num_blocks: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        conv3_dim = c.encoder_hidden_dim * 2
        conv4_dim = round(c.hidden_expansion * c.encoder_hidden_dim // 2)
        split_dim = conv3_dim // 2
        h = ConvNorm(conv3_dim, 1, act="silu", name="conv1")(x, train)
        a, b = h[..., :split_dim], h[..., split_dim:]
        b1 = CSPRepLayer(conv4_dim, self.num_blocks, name="csp_rep1")(b, train)
        b1 = ConvNorm(conv4_dim, 3, act="silu", name="conv2")(b1, train)
        b2 = CSPRepLayer(conv4_dim, self.num_blocks, name="csp_rep2")(b1, train)
        b2 = ConvNorm(conv4_dim, 3, act="silu", name="conv3")(b2, train)
        merged = jnp.concatenate([a, b, b1, b2], axis=-1)
        return ConvNorm(c.encoder_hidden_dim, 1, act="silu",
                        name="conv4")(merged, train)


class SCDown(nn.Module):
    cfg: DFineConfig
    kernel: int = 3
    stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.cfg.encoder_hidden_dim
        x = ConvNorm(d, 1, name="conv1")(x, train)
        return ConvNorm(d, self.kernel, stride=self.stride, groups=d,
                        name="conv2")(x, train)


class TorchMHA(nn.Module):
    """Separate-projection MHA with optional additive pos embeddings on
    q/k (HF DFineMultiheadAttention semantics; ``attention_dropout`` on
    the softmaxed weights, active only under ``train``)."""

    num_heads: int
    attention_dropout: float = 0.0
    # serving-only fused attention (ops/pallas_attention): scores stay
    # in VMEM instead of materializing (B, h, N, N) in HBM. Inference
    # path only — training/dropout/masked calls keep the einsum chain.
    fused: bool = False

    @nn.compact
    def __call__(self, x, pos: Optional[jnp.ndarray] = None,
                 attn_mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        d = x.shape[-1]
        h = self.num_heads
        dh = d // h
        qk_in = x if pos is None else x + pos
        q = nn.Dense(d, name="q_proj")(qk_in) * (dh ** -0.5)
        k = nn.Dense(d, name="k_proj")(qk_in)
        v = nn.Dense(d, name="v_proj")(x)

        if self.fused and not train and attn_mask is None:
            from pautdx.ops.pallas_attention import aifi_attention

            out = aifi_attention(q, k, v, num_heads=h)
            return nn.Dense(d, name="out_proj")(out)

        def split(t):
            return t.reshape(t.shape[:-1] + (h, dh))

        logits = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k))
        if attn_mask is not None:
            logits = logits + attn_mask
        w = nn.softmax(logits, axis=-1)
        if self.attention_dropout > 0:
            w = nn.Dropout(self.attention_dropout, deterministic=not train)(w)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, split(v))
        out = out.reshape(out.shape[:-2] + (d,))
        return nn.Dense(d, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """AIFI encoder layer (post-norm, gelu)."""

    cfg: DFineConfig

    @nn.compact
    def __call__(self, x, pos, train: bool = False):
        c = self.cfg

        def drop(t, rate):
            if rate > 0:
                t = nn.Dropout(rate, deterministic=not train)(t)
            return t

        a = TorchMHA(c.encoder_attention_heads, c.attention_dropout,
                     fused=c.encoder_fused_attn,
                     name="self_attn")(x, pos=pos, train=train)
        x = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(
            x + drop(a, c.dropout))
        h = nn.gelu(nn.Dense(c.encoder_ffn_dim, name="fc1")(x),
                    approximate=c.encoder_act_approx)
        h = nn.Dense(c.encoder_hidden_dim, name="fc2")(drop(
            h, c.activation_dropout))
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(
            x + drop(h, c.dropout))


class HybridEncoder(nn.Module):
    """AIFI on the last level + FPN/PAN cross-scale fusion."""

    cfg: DFineConfig

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False
                 ) -> List[jnp.ndarray]:
        c = self.cfg
        feats = list(feats)
        # AIFI on the last level
        x = feats[-1]
        B, H, W, D = x.shape
        src = x.reshape(B, H * W, D)
        # cast the constant to the activation dtype: a float32 constant
        # would silently promote the whole downstream FPN/PAN to fp32
        pos = jnp.asarray(sincos_position_embedding(W, H, c.encoder_hidden_dim),
                          dtype=src.dtype)
        for li in range(c.encoder_layers):
            src = EncoderLayer(c, name=f"encoder.0.layers.{li}")(
                src, pos, train)
        feats[-1] = src.reshape(B, H, W, D)

        n_blocks = max(1, round(3 * c.depth_mult))
        # top-down FPN
        fpn_maps = [feats[-1]]
        n_stages = len(feats) - 1
        for idx in range(n_stages):
            lower = feats[n_stages - idx - 1]
            top = ConvNorm(c.encoder_hidden_dim, 1,
                           name=f"lateral_convs.{idx}")(fpn_maps[-1], train)
            fpn_maps[-1] = top
            up = jnp.repeat(jnp.repeat(top, 2, axis=1), 2, axis=2)
            up = up[:, :lower.shape[1], :lower.shape[2]]
            fused = jnp.concatenate([up, lower], axis=-1)
            fpn_maps.append(RepNCSPELAN4(c, n_blocks,
                                         name=f"fpn_blocks.{idx}")(fused, train))
        fpn_maps = fpn_maps[::-1]
        # bottom-up PAN
        pan_maps = [fpn_maps[0]]
        for idx in range(n_stages):
            down = SCDown(c, name=f"downsample_convs.{idx}")(pan_maps[-1], train)
            fused = jnp.concatenate([down, fpn_maps[idx + 1]], axis=-1)
            pan_maps.append(RepNCSPELAN4(c, n_blocks,
                                         name=f"pan_blocks.{idx}")(fused, train))
        return pan_maps


class MLPHead(nn.Module):
    """torch DFineMLP / DFineMLPPredictionHead: Linears with act between."""

    hidden: int
    out: int
    num_layers: int
    act: str = "relu"

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            feat = self.out if last else self.hidden
            x = nn.Dense(feat, name=f"layers.{i}")(x)
            if not last:
                x = nn.relu(x) if self.act == "relu" else nn.silu(x)
        return x


class Gate(nn.Module):
    @nn.compact
    def __call__(self, second_residual, hidden):
        d = hidden.shape[-1]
        gates = nn.sigmoid(nn.Dense(2 * d, name="gate")(
            jnp.concatenate([second_residual, hidden], axis=-1)))
        g1, g2 = jnp.split(gates, 2, axis=-1)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(g1 * second_residual + g2 * hidden)


class LQE(nn.Module):
    cfg: DFineConfig

    @nn.compact
    def __call__(self, scores, pred_corners):
        c = self.cfg
        B, L, _ = pred_corners.shape
        prob = nn.softmax(pred_corners.reshape(B, L, 4, c.max_num_bins + 1),
                          axis=-1)
        # NOTE: an argmax+mask top-k replacement for this sort was tried
        # and measured SLOWER on-chip (3868 vs 4382 fps at b64) — the
        # variadic sort over 33 bins is cheaper than 4 argmax rounds.
        topk = jax.lax.top_k(prob, c.top_prob_values)[0]
        stat = jnp.concatenate([topk, topk.mean(axis=-1, keepdims=True)], -1)
        quality = MLPHead(c.lqe_hidden_dim, 1, 2, name="reg_conf")(
            stat.reshape(B, L, -1))
        return scores + quality


class DeformableAttention(nn.Module):
    """Multi-scale deformable cross-attention (HF
    DFineMultiscaleDeformableAttention; 4-ref-point branch)."""

    cfg: DFineConfig

    @nn.compact
    def __call__(self, hidden, value_levels, reference_points):
        c = self.cfg
        B, Q, _ = hidden.shape
        n_heads = c.decoder_attention_heads
        pts_list = c.num_points_list
        total = sum(pts_list)
        n_loc = 1 if c.decoder_shared_points else n_heads
        offsets = nn.Dense(n_loc * total * 2, name="sampling_offsets")(hidden)
        offsets = offsets.reshape(B, Q, n_loc, total, 2)
        weights = nn.Dense(n_heads * total, name="attention_weights")(hidden)
        weights = nn.softmax(weights.reshape(B, Q, n_heads, total), axis=-1)
        scale = jnp.asarray(
            [1.0 / p for p in pts_list for _ in range(p)], jnp.float32)
        # coordinate math in fp32 regardless of feature dtype
        offsets = offsets.astype(jnp.float32)
        reference_points = reference_points.astype(jnp.float32)
        offset = (offsets * scale[None, None, None, :, None]
                  * reference_points[:, :, None, None, 2:]
                  * c.decoder_offset_scale)
        locations = reference_points[:, :, None, None, :2] + offset
        w = weights.astype(value_levels[0].dtype)
        if c.decoder_shared_points:
            out = ms_deformable_attention_shared(
                value_levels, locations[:, :, 0], w, pts_list,
                method=c.decoder_method)
        else:
            out = ms_deformable_attention(value_levels, locations, w,
                                          pts_list, method=c.decoder_method)
        return out.astype(hidden.dtype)


class DecoderLayer(nn.Module):
    cfg: DFineConfig

    @nn.compact
    def __call__(self, hidden, pos, value_levels, reference_points,
                 train: bool = False, attn_mask: Optional[jnp.ndarray] = None):
        c = self.cfg

        def drop(t, rate):
            if rate > 0:
                t = nn.Dropout(rate, deterministic=not train)(t)
            return t

        a = TorchMHA(c.decoder_attention_heads, c.attention_dropout,
                     name="self_attn")(
            hidden, pos=pos, attn_mask=attn_mask, train=train)
        hidden = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(
            hidden + drop(a, c.dropout))
        residual = hidden
        q = hidden if pos is None else hidden + pos
        cross = DeformableAttention(c, name="encoder_attn")(
            q, value_levels, reference_points)
        hidden = Gate(name="gateway")(residual, drop(cross, c.dropout))
        h = nn.relu(nn.Dense(c.decoder_ffn_dim, name="fc1")(hidden))
        h = nn.Dense(c.d_model, name="fc2")(drop(h, c.activation_dropout))
        hidden = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(
            jnp.clip(hidden + drop(h, c.dropout), -65504.0, 65504.0))
        return hidden


class DFine(nn.Module):
    """Full detector. Returns dict with final + per-layer predictions.

    Output (eval): ``logits`` (B, Q, num_labels), ``pred_boxes`` (B, Q, 4)
    cxcywh normalized; plus intermediates for the training criterion.
    """

    cfg: DFineConfig = DFineConfig()

    def generate_anchors(self, spatial_shapes) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        anchors = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                                 np.arange(w, dtype=np.float32), indexing="ij")
            gxy = (np.stack([gx, gy], -1) + 0.5) / np.asarray([w, h], np.float32)
            # anchor wh scales with the level's stride (0.05 * stride/8 —
            # reduces to HF's 0.05 * 2^lvl for the default (8, 16, 32))
            wh = np.ones_like(gxy) * c.anchor_grid_size * (
                c.feat_strides[lvl] / 8.0)
            anchors.append(np.concatenate([gxy, wh], -1).reshape(-1, 4))
        anchors = np.concatenate(anchors, 0)[None]
        eps = 1e-2
        valid = ((anchors > eps) & (anchors < 1 - eps)).all(-1, keepdims=True)
        anchors = np.log(anchors / (1 - anchors))
        anchors = np.where(valid, anchors, np.finfo(np.float32).max)
        return jnp.asarray(anchors), jnp.asarray(valid.astype(np.float32))

    @nn.compact
    def __call__(self, images, train: bool = False,
                 denoising: Optional[Dict[str, jnp.ndarray]] = None
                 ) -> Dict[str, Any]:
        """``denoising`` (training only): the static-shape contrastive
        denoising group from ``pautdx.losses.denoising`` — class_ids (B, D),
        box_logits (B, D, 4), attn_mask (D+Q, D+Q). Denoising queries are
        prepended; outputs carry ``dn_split`` so the criterion can slice."""
        c = self.cfg
        feats = HGNetV2(c.backbone, name="model.backbone.model")(images, train)
        proj = []
        for i, f in enumerate(feats):
            f = nn.Conv(c.encoder_hidden_dim, (1, 1), use_bias=False,
                        name=f"model.encoder_input_proj.{i}.0")(f)
            f = nn.BatchNorm(use_running_average=not train,
                             name=f"model.encoder_input_proj.{i}.1")(f)
            proj.append(f)
        sources = HybridEncoder(c, name="model.encoder")(proj, train)

        spatial_shapes = [(s.shape[1], s.shape[2]) for s in sources]
        flat = jnp.concatenate(
            [s.reshape(s.shape[0], -1, c.d_model) for s in sources], axis=1)
        anchors, valid_mask = self.generate_anchors(spatial_shapes)
        # dtype discipline: features ride the activation dtype (bf16 in
        # serving), while box/coordinate math stays fp32 — anchors/logit
        # coords need more mantissa than bf16 carries
        memory = valid_mask.astype(flat.dtype) * flat
        out_mem = nn.Dense(c.d_model, name="model.enc_output.0")(memory)
        out_mem = nn.LayerNorm(epsilon=1e-5, name="model.enc_output.1")(out_mem)
        enc_class = nn.Dense(c.num_labels, name="model.enc_score_head")(out_mem)

        num_queries = min(c.num_queries, enc_class.shape[1])
        if c.query_topk == "approx":
            # TPU-native approximate top-k: no full sort over the anchor
            # axis. Selection is a heuristic; approximate recall is free.
            topk_ind = jax.lax.approx_max_k(
                enc_class.max(-1).astype(jnp.float32), num_queries)[1]
        else:
            topk_ind = jax.lax.top_k(enc_class.max(-1), num_queries)[1]
        take = lambda t: jnp.take_along_axis(   # noqa: E731
            t, topk_ind[..., None], axis=1)
        # enc_bbox_head is per-token, so it commutes with the top-k gather:
        # run it on the SELECTED tokens only (num_queries instead of every
        # anchor — 56x fewer tokens at nano sizes, identical numerics)
        sel_anchors = jnp.take_along_axis(
            jnp.broadcast_to(anchors, (enc_class.shape[0],) + anchors.shape[1:]),
            topk_ind[..., None], axis=1)
        ref_unact = MLPHead(c.d_model, 4, 3, name="model.enc_bbox_head")(
            take(out_mem)).astype(jnp.float32) + sel_anchors
        enc_topk_logits = take(enc_class)
        enc_topk_bboxes = nn.sigmoid(ref_unact)
        target = jax.lax.stop_gradient(take(out_mem))
        init_ref = jax.lax.stop_gradient(ref_unact)

        # contrastive denoising queries (the embedding always exists so the
        # param tree never depends on call arguments)
        dn_embed = nn.Embed(c.num_labels + 1, c.d_model,
                            name="model.denoising_class_embed")
        attn_mask = None
        dn_split = 0
        if denoising is not None:
            dn_target = dn_embed(denoising["class_ids"]).astype(target.dtype)
            target = jnp.concatenate([dn_target, target], axis=1)
            init_ref = jnp.concatenate(
                [denoising["box_logits"].astype(init_ref.dtype), init_ref],
                axis=1)
            attn_mask = denoising["attn_mask"][None, None]
            dn_split = denoising["class_ids"].shape[1]
        else:
            # touch the embedding so flax registers its params on init
            _ = dn_embed(jnp.zeros((1,), jnp.int32))

        # decoder with FDR
        n_heads = c.decoder_attention_heads
        value_levels = [
            s.reshape(s.shape[0], s.shape[1], s.shape[2], n_heads, c.head_dim)
            for s in sources
        ]
        project = weighting_function(c.max_num_bins, c.up, c.reg_scale)
        ref_points = nn.sigmoid(init_ref)
        hidden = target
        out_logits, out_boxes, out_corners, out_refs = [], [], [], []
        pred_corners_undetach = 0.0
        output_detach = 0.0
        ref_points_initial = None
        eval_idx = (c.eval_idx if c.eval_idx >= 0
                    else c.decoder_layers + c.eval_idx)
        # query_pos_head is one module shared by every decoder layer
        query_pos_head = MLPHead(2 * c.d_model, c.d_model, 2,
                                 name="model.decoder.query_pos_head")
        for i in range(c.decoder_layers):
            ref_detach = jax.lax.stop_gradient(ref_points)
            pos = jnp.clip(query_pos_head(ref_detach), -10.0, 10.0)
            pos = pos.astype(hidden.dtype)          # back to feature dtype
            hidden = DecoderLayer(c, name=f"model.decoder.layers.{i}")(
                hidden, pos, value_levels, ref_detach, train, attn_mask)
            if i == 0:
                new_ref = nn.sigmoid(
                    MLPHead(c.d_model, 4, 3,
                            name="model.decoder.pre_bbox_head")(hidden)
                    + inverse_sigmoid(ref_detach))
                ref_points_initial = jax.lax.stop_gradient(new_ref)
            pred_corners = MLPHead(c.d_model, 4 * (c.max_num_bins + 1), 3,
                                   name=f"bbox_embed.{i}")(
                hidden + output_detach) + pred_corners_undetach
            inter_ref = distance2bbox(
                ref_points_initial,
                integral(pred_corners, project, c.max_num_bins), c.reg_scale)
            pred_corners_undetach = pred_corners
            ref_points = jax.lax.stop_gradient(inter_ref)
            output_detach = jax.lax.stop_gradient(hidden)

            # class/LQE heads exist for every layer (param creation must not
            # depend on train/eval); intermediates collected for the loss
            scores = nn.Dense(c.num_labels, name=f"class_embed.{i}")(hidden)
            if i == 0:
                out_logits.append(scores)
                out_boxes.append(new_ref)
            scores = LQE(c, name=f"model.decoder.lqe_layers.{i}")(
                scores, pred_corners)
            out_logits.append(scores)
            out_boxes.append(inter_ref)
            out_corners.append(pred_corners)
            out_refs.append(ref_points_initial)

        if dn_split:
            # split denoising predictions off every collected head
            def split(t):
                return t[:, :dn_split], t[:, dn_split:]
            dn_logits = [split(t)[0] for t in out_logits]
            dn_boxes = [split(t)[0] for t in out_boxes]
            out_logits = [split(t)[1] for t in out_logits]
            out_boxes = [split(t)[1] for t in out_boxes]
            out_corners = [split(t)[1] for t in out_corners]
            out_refs = [split(t)[1] for t in out_refs]
            hidden = hidden[:, dn_split:]
            return {
                "logits": out_logits[eval_idx + 1],
                "pred_boxes": out_boxes[eval_idx + 1],
                "last_hidden_state": hidden,
                "intermediate_logits": out_logits,
                "intermediate_boxes": out_boxes,
                "intermediate_corners": out_corners,
                "initial_references": out_refs,
                "dn_logits": dn_logits,
                "dn_boxes": dn_boxes,
                "enc_topk_logits": enc_topk_logits,
                "enc_topk_bboxes": enc_topk_bboxes,
                "project": project,
            }
        return {
            "logits": out_logits[eval_idx + 1],
            "pred_boxes": out_boxes[eval_idx + 1],
            "last_hidden_state": hidden,
            "intermediate_logits": out_logits,
            "intermediate_boxes": out_boxes,
            "intermediate_corners": out_corners,
            "initial_references": out_refs,
            "enc_topk_logits": enc_topk_logits,
            "enc_topk_bboxes": enc_topk_bboxes,
            "project": project,
        }


def post_process(logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                 target_size: Tuple[int, int], threshold: float = 0.3,
                 max_det: int = 100) -> Dict[str, jnp.ndarray]:
    """HF post_process_object_detection semantics (focal/sigmoid path):
    per-query best class via sigmoid, boxes cxcywh->xyxy scaled to pixels,
    fixed-size top-k with a validity mask (TPU-friendly)."""
    probs = nn.sigmoid(logits)
    B, Q, L = probs.shape
    flat = probs.reshape(B, Q * L)
    k = min(max_det, Q * L)
    top_scores, idx = jax.lax.top_k(flat, k)
    q_idx = idx // L
    classes = idx % L
    H, W = target_size
    cx, cy, w, h = (pred_boxes[..., 0], pred_boxes[..., 1],
                    pred_boxes[..., 2], pred_boxes[..., 3])
    xyxy = jnp.stack([(cx - w / 2) * W, (cy - h / 2) * H,
                      (cx + w / 2) * W, (cy + h / 2) * H], axis=-1)
    boxes = jnp.take_along_axis(xyxy, q_idx[..., None], axis=1)
    valid = top_scores >= threshold
    return {"scores": top_scores, "classes": classes, "boxes": boxes,
            "valid": valid}
