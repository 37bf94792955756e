"""YOLO detector/segmenter family in JAX (flax.linen).

TPU-native re-implementation of the capability the reference gets from
Ultralytics (`BscanBased/yolo5s_retrain.py`, `yolo_seg_train.py`,
`yolo8_seg_predict.py`, `yolo/yolo_bbox_retrain.py` — SURVEY.md §2.1):
CSP backbone (C3 for the v5u flavour, C2f for v8, GELAN/RepNCSPELAN4
for v9c, C3k2+C2PSA for v11), SPPF/SPPELAN, PAN neck, anchor-free
decoupled detect head with DFL box distributions, and an optional
segmentation head (prototype masks + per-anchor coefficients).

Anchor-free + DFL covers all four reference trainings: ultralytics
``yolov5su.pt`` uses the same updated (u) head as v8; ``yolov9c-seg``
(`yolo_seg_train.py:5-19`) and ``yolo11n`` (`yolo_bbox_retrain.py:6-18`)
share it too (v11 swaps the cls branch for the DWConv form).

The module tree is STRUCTURALLY ALIGNED with Ultralytics so their
checkpoints import mechanically (``pautdx.compat.yolo_import``):

- head channels follow the Ultralytics formulas: box branch
  ``c2 = max(16, p3_ch // 4, 4 * reg_max)``, cls branch
  ``c3 = max(p3_ch, min(num_classes, 100))`` — identical across levels;
- the v5u flavour has the 6x6/s2 stem, stage depths (3, 6, 9, 3), and
  the lateral 1x1 convs in the PAN neck (yolov5.yaml head);
- the seg heads mirror Ultralytics ``Segment``: Proto with a learned
  2x2/s2 transposed-conv upsample, 3-layer coefficient branches;
- submodule names mirror Ultralytics (cv1/cv2/m.N/conv/bn).

Everything is static-shape: detection outputs are dense per-level grids;
NMS (``pautdx.ops.nms``) runs on fixed-size top-k.

Scales (v8/v5): n = depth 1/3, width 1/4; s = 1/3, 1/2; m = 2/3, 0.75,
max_channels 768 — of base widths (64, 128, 256, 512, 1024), Ultralytics
``make_divisible`` rounding. v11: depth 0.5 at every scale, widths
0.25/0.5/1.0, max_channels 1024/1024/512. v9c is unscaled (the yaml's
fixed channels).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

STRIDES = (8, 16, 32)


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    num_classes: int = 1
    scale: str = "n"                 # n | s | m
    flavour: str = "v8"              # v8 (C2f) | v5 (C3, v5u layout)
    #                                | v9c (GELAN) | v11 (C3k2+C2PSA)
    reg_max: int = 16                # DFL bins
    num_protos: int = 32             # seg mask coefficients (nm)
    seg: bool = False

    @property
    def depth_mult(self) -> float:
        if self.flavour == "v9c":
            return 1.0               # yolov9c.yaml: unscaled
        if self.flavour == "v11":
            return 0.5               # yolo11.yaml scales: all 0.50
        return {"n": 1 / 3, "s": 1 / 3, "m": 2 / 3}[self.scale]

    @property
    def width_mult(self) -> float:
        if self.flavour == "v9c":
            return 1.0
        if self.flavour == "v11":
            return {"n": 0.25, "s": 0.5, "m": 1.0}[self.scale]
        return {"n": 0.25, "s": 0.5, "m": 0.75}[self.scale]

    @property
    def max_channels(self) -> int:
        """Ultralytics per-scale max_channels clamp (yolov8/yolo11 yaml)."""
        if self.flavour == "v9c":
            return 1024
        if self.flavour == "v11":
            return {"n": 1024, "s": 1024, "m": 512}[self.scale]
        return {"n": 1024, "s": 1024, "m": 768}[self.scale]

    @property
    def stage_depths(self) -> Tuple[int, int, int, int]:
        # yolov8.yaml: (3, 6, 6, 3); yolov5.yaml: (3, 6, 9, 3);
        # yolo11.yaml: (2, 2, 2, 2)
        if self.flavour == "v11":
            return (2, 2, 2, 2)
        return (3, 6, 6, 3) if self.flavour == "v8" else (3, 6, 9, 3)

    @property
    def c3k(self) -> bool:
        """v11: C3k inner blocks everywhere at m+ scales (parse_model:
        ``if scale in "mlx": args[3] = True``)."""
        return self.scale in ("m", "l", "x")

    def width(self, w: int) -> int:
        # make_divisible(min(w, max_channels) * width_mult, 8)
        import math
        return max(8, math.ceil(
            min(w, self.max_channels) * self.width_mult / 8) * 8)

    def depth(self, d: int) -> int:
        return max(1, round(d * self.depth_mult))

    @property
    def proto_channels(self) -> int:
        """Ultralytics Segment npr = 256 * width."""
        return self.width(256)


class ConvBnSiLU(nn.Module):
    """Ultralytics ``Conv``: conv (no bias) + BN(eps 1e-3) + SiLU.

    ``act=False`` gives the activation-free form (PSA qkv/proj/pe);
    ``groups=features`` gives ``DWConv``.
    """

    features: int
    kernel: int = 1
    stride: int = 1
    padding: Optional[int] = None     # None -> (k-1)//2 (odd-k SAME)
    act: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from pautdx.ops.qconv import (
            int8_conv, shared_conv_kernel, sow_calibration, wants_int8,
        )

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
                        feature_group_count=self.groups,
                        name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, name="bn")(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    kernel1: int = 3                 # C2f: (3, 3); C3: (1, 3)
    e: float = 1.0                   # hidden expansion (C3k2 plain: 0.5)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = max(1, int(self.features * self.e))
        h = ConvBnSiLU(c_, self.kernel1, name="cv1")(x, train)
        h = ConvBnSiLU(self.features, 3, name="cv2")(h, train)
        return x + h if self.shortcut and x.shape[-1] == self.features else h


class C2f(nn.Module):
    """v8 cross-stage partial with dense skip concatenation."""

    features: int
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y = ConvBnSiLU(2 * c, 1, name="cv1")(x, train)
        parts = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            parts.append(Bottleneck(c, self.shortcut, name=f"m.{i}")(
                parts[-1], train))
        return ConvBnSiLU(self.features, 1, name="cv2")(
            jnp.concatenate(parts, axis=-1), train)


class C3(nn.Module):
    """v5 CSP block."""

    features: int
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        a = ConvBnSiLU(c, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c, self.shortcut, kernel1=1, name=f"m.{i}")(
                a, train)
        b = ConvBnSiLU(c, 1, name="cv2")(x, train)
        return ConvBnSiLU(self.features, 1, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train)


class SPPF(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        x = ConvBnSiLU(c, 1, name="cv1")(x, train)
        pools = [x]
        for _ in range(3):
            pools.append(nn.max_pool(pools[-1], (5, 5), strides=(1, 1),
                                     padding="SAME"))
        return ConvBnSiLU(self.features, 1, name="cv2")(
            jnp.concatenate(pools, axis=-1), train)


# --- v9 (GELAN) blocks -----------------------------------------------------


class RepConvN(nn.Module):
    """Ultralytics ``RepConvN`` in its train (unfused) form: 3x3 conv+BN
    plus 1x1 conv+BN branches summed, SiLU. Pretrained ``.pt`` files ship
    this unfused tree (conv1/conv2), so the JAX module mirrors it; XLA
    fuses the two branches at compile time anyway."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = ConvBnSiLU(self.features, 3, act=False, name="conv1")(x, train)
        b = ConvBnSiLU(self.features, 1, act=False, name="conv2")(x, train)
        return nn.silu(a + b)


class RepNBottleneck(nn.Module):
    features: int
    shortcut: bool = True
    e: float = 1.0                   # RepNCSP uses e=1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = max(1, int(self.features * self.e))
        h = RepConvN(c_, name="cv1")(x, train)
        h = ConvBnSiLU(self.features, 3, name="cv2")(h, train)
        return x + h if self.shortcut and x.shape[-1] == self.features else h


class RepNCSP(nn.Module):
    """CSP over RepNBottlenecks (C3 layout with Rep blocks)."""

    features: int
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        a = ConvBnSiLU(c, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = RepNBottleneck(c, self.shortcut, name=f"m.{i}")(a, train)
        b = ConvBnSiLU(c, 1, name="cv2")(x, train)
        return ConvBnSiLU(self.features, 1, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train)


class RepNCSPELAN4(nn.Module):
    """GELAN unit: split, two sequential RepNCSP+Conv branches, dense
    concat (yolov9 csp-elan)."""

    features: int                    # c2
    mid: int                         # c3 (split width)
    branch: int                      # c4 (per-branch width)
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = list(jnp.split(
            ConvBnSiLU(self.mid, 1, name="cv1")(x, train), 2, axis=-1))
        h = RepNCSP(self.branch, self.n, name="cv2.0")(y[-1], train)
        y.append(ConvBnSiLU(self.branch, 3, name="cv2.1")(h, train))
        h = RepNCSP(self.branch, self.n, name="cv3.0")(y[-1], train)
        y.append(ConvBnSiLU(self.branch, 3, name="cv3.1")(h, train))
        return ConvBnSiLU(self.features, 1, name="cv4")(
            jnp.concatenate(y, axis=-1), train)


class ADown(nn.Module):
    """v9 downsampler: avg-pool 2/1, split; 3x3/s2 conv ∥ maxpool+1x1."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        x1, x2 = jnp.split(x, 2, axis=-1)
        x1 = ConvBnSiLU(c, 3, 2, name="cv1")(x1, train)
        x2 = nn.max_pool(x2, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)))
        x2 = ConvBnSiLU(c, 1, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], axis=-1)


class SPPELAN(nn.Module):
    """v9 SPP: 1x1 in, three chained 5x5 maxpools, concat, 1x1 out."""

    features: int                    # c2
    mid: int                         # c3

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = [ConvBnSiLU(self.mid, 1, name="cv1")(x, train)]
        for _ in range(3):
            y.append(nn.max_pool(y[-1], (5, 5), strides=(1, 1),
                                 padding="SAME"))
        return ConvBnSiLU(self.features, 1, name="cv5")(
            jnp.concatenate(y, axis=-1), train)


# --- v11 blocks ------------------------------------------------------------


class C3k(nn.Module):
    """C3 with 3x3-kernel bottlenecks (v11 inner block)."""

    features: int
    n: int = 2
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        a = ConvBnSiLU(c, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c, self.shortcut, kernel1=3, name=f"m.{i}")(
                a, train)
        b = ConvBnSiLU(c, 1, name="cv2")(x, train)
        return ConvBnSiLU(self.features, 1, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train)


class C3k2(nn.Module):
    """v11 cross-stage partial: C2f layout whose inner blocks are plain
    Bottlenecks (e=0.5, k=3) or C3k units when ``c3k``."""

    features: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    shortcut: bool = True            # yaml passes no shortcut arg -> True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = max(1, int(self.features * self.e))
        y = ConvBnSiLU(2 * c, 1, name="cv1")(x, train)
        parts = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            if self.c3k:
                parts.append(C3k(c, 2, self.shortcut, name=f"m.{i}")(
                    parts[-1], train))
            else:
                parts.append(Bottleneck(c, self.shortcut, kernel1=3, e=0.5,
                                        name=f"m.{i}")(parts[-1], train))
        return ConvBnSiLU(self.features, 1, name="cv2")(
            jnp.concatenate(parts, axis=-1), train)


class PSAAttention(nn.Module):
    """v11 ``Attention``: per-head qkv from a 1x1 conv, softmax attention
    over the spatial axis, plus a depthwise 3x3 positional branch on v."""

    num_heads: int
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        head_dim = C // self.num_heads
        key_dim = max(1, int(head_dim * self.attn_ratio))
        h = C + 2 * key_dim * self.num_heads
        qkv = ConvBnSiLU(h, 1, act=False, name="qkv")(x, train)
        qkv = qkv.reshape(B, H * W, self.num_heads, 2 * key_dim + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, 2 * key_dim], axis=-1)
        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k) * (key_dim ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, H, W, C)
        v_img = v.reshape(B, H, W, C)
        out = out + ConvBnSiLU(C, 3, act=False, groups=C, name="pe")(
            v_img, train)
        return ConvBnSiLU(C, 1, act=False, name="proj")(out, train)


class PSABlock(nn.Module):
    features: int
    num_heads: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + PSAAttention(self.num_heads, name="attn")(x, train)
        h = ConvBnSiLU(2 * self.features, 1, name="ffn.0")(x, train)
        h = ConvBnSiLU(self.features, 1, act=False, name="ffn.1")(h, train)
        return x + h


class C2PSA(nn.Module):
    """v11 partial self-attention stage (after SPPF)."""

    features: int
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y = ConvBnSiLU(2 * c, 1, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        heads = max(1, c // 64)
        for i in range(self.n):
            b = PSABlock(c, heads, name=f"m.{i}")(b, train)
        return ConvBnSiLU(self.features, 1, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train)


def _upsample2x(x):
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class Backbone(nn.Module):
    cfg: YoloConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        if cfg.flavour == "v9c":
            return self._v9c(x, train)
        w, d = cfg.width, cfg.depth
        d1, d2, d3, d4 = cfg.stage_depths
        if cfg.flavour == "v5":
            # yolov5.yaml: 6x6 stride-2 pad-2 stem
            x = ConvBnSiLU(w(64), 6, 2, padding=2, name="stem")(x, train)
        else:
            x = ConvBnSiLU(w(64), 3, 2, name="stem")(x, train)           # /2
        x = ConvBnSiLU(w(128), 3, 2, name="down1")(x, train)             # /4
        if cfg.flavour == "v11":
            c3k = cfg.c3k
            x = C3k2(w(256), d(d1), c3k, 0.25, name="c1")(x, train)
            x = ConvBnSiLU(w(256), 3, 2, name="down2")(x, train)         # /8
            p3 = C3k2(w(512), d(d2), c3k, 0.25, name="c2")(x, train)
            x = ConvBnSiLU(w(512), 3, 2, name="down3")(p3, train)        # /16
            p4 = C3k2(w(512), d(d3), True, name="c3")(x, train)
            x = ConvBnSiLU(w(1024), 3, 2, name="down4")(p4, train)       # /32
            x = C3k2(w(1024), d(d4), True, name="c4")(x, train)
            x = SPPF(w(1024), name="sppf")(x, train)
            p5 = C2PSA(w(1024), d(2), name="psa")(x, train)
            return p3, p4, p5
        block = C2f if cfg.flavour == "v8" else C3
        x = block(w(128), d(d1), name="c1")(x, train)
        x = ConvBnSiLU(w(256), 3, 2, name="down2")(x, train)             # /8
        p3 = block(w(256), d(d2), name="c2")(x, train)
        x = ConvBnSiLU(w(512), 3, 2, name="down3")(p3, train)            # /16
        p4 = block(w(512), d(d3), name="c3")(x, train)
        x = ConvBnSiLU(w(1024), 3, 2, name="down4")(p4, train)           # /32
        x = block(w(1024), d(d4), name="c4")(x, train)
        p5 = SPPF(w(1024), name="sppf")(x, train)
        return p3, p4, p5

    def _v9c(self, x, train):
        """yolov9c.yaml backbone: GELAN stages + ADown + SPPELAN."""
        x = ConvBnSiLU(64, 3, 2, name="stem")(x, train)                  # /2
        x = ConvBnSiLU(128, 3, 2, name="down1")(x, train)                # /4
        x = RepNCSPELAN4(256, 128, 64, 1, name="c1")(x, train)
        x = ADown(256, name="down2")(x, train)                           # /8
        p3 = RepNCSPELAN4(512, 256, 128, 1, name="c2")(x, train)
        x = ADown(512, name="down3")(p3, train)                          # /16
        p4 = RepNCSPELAN4(512, 512, 256, 1, name="c3")(x, train)
        x = ADown(512, name="down4")(p4, train)                          # /32
        x = RepNCSPELAN4(512, 512, 256, 1, name="c4")(x, train)
        p5 = SPPELAN(512, 256, name="sppf")(x, train)
        return p3, p4, p5


class Neck(nn.Module):
    """PAN: top-down fusion then bottom-up aggregation.

    v8 layout: concat(upsample, skip) -> C2f. v5u layout adds the
    lateral 1x1 convs of yolov5.yaml (layers 10/14) whose outputs also
    feed the bottom-up concats (layers 19/22).
    """

    cfg: YoloConfig

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cfg = self.cfg
        w, d = cfg.width, cfg.depth
        p3, p4, p5 = feats
        if cfg.flavour == "v9c":
            h4 = RepNCSPELAN4(512, 512, 256, 1, name="td4")(
                jnp.concatenate([_upsample2x(p5), p4], axis=-1), train)
            h3 = RepNCSPELAN4(256, 256, 128, 1, name="td3")(
                jnp.concatenate([_upsample2x(h4), p3], axis=-1), train)
            n4 = RepNCSPELAN4(512, 512, 256, 1, name="bu4")(
                jnp.concatenate([ADown(256, name="d3")(h3, train), h4],
                                axis=-1), train)
            n5 = RepNCSPELAN4(512, 512, 256, 1, name="bu5")(
                jnp.concatenate([ADown(512, name="d4")(n4, train), p5],
                                axis=-1), train)
            return h3, n4, n5
        if cfg.flavour == "v11":
            c3k = cfg.c3k
            h4 = C3k2(w(512), d(2), c3k, name="td4")(
                jnp.concatenate([_upsample2x(p5), p4], axis=-1), train)
            h3 = C3k2(w(256), d(2), c3k, name="td3")(
                jnp.concatenate([_upsample2x(h4), p3], axis=-1), train)
            n4 = C3k2(w(512), d(2), c3k, name="bu4")(
                jnp.concatenate([
                    ConvBnSiLU(w(256), 3, 2, name="d3")(h3, train), h4],
                    axis=-1), train)
            n5 = C3k2(w(1024), d(2), True, name="bu5")(
                jnp.concatenate([
                    ConvBnSiLU(w(512), 3, 2, name="d4")(n4, train), p5],
                    axis=-1), train)
            return h3, n4, n5
        block = C2f if cfg.flavour == "v8" else C3
        if cfg.flavour == "v8":
            h4 = block(w(512), d(3), shortcut=False, name="td4")(
                jnp.concatenate([_upsample2x(p5), p4], axis=-1), train)
            h3 = block(w(256), d(3), shortcut=False, name="td3")(
                jnp.concatenate([_upsample2x(h4), p3], axis=-1), train)
            n4 = block(w(512), d(3), shortcut=False, name="bu4")(
                jnp.concatenate([
                    ConvBnSiLU(w(256), 3, 2, name="d3")(h3, train), h4],
                    axis=-1), train)
            n5 = block(w(1024), d(3), shortcut=False, name="bu5")(
                jnp.concatenate([
                    ConvBnSiLU(w(512), 3, 2, name="d4")(n4, train), p5],
                    axis=-1), train)
            return h3, n4, n5
        # v5u
        l5 = ConvBnSiLU(w(512), 1, name="lat5")(p5, train)
        h4 = block(w(512), d(3), shortcut=False, name="td4")(
            jnp.concatenate([_upsample2x(l5), p4], axis=-1), train)
        l4 = ConvBnSiLU(w(256), 1, name="lat4")(h4, train)
        h3 = block(w(256), d(3), shortcut=False, name="td3")(
            jnp.concatenate([_upsample2x(l4), p3], axis=-1), train)
        n4 = block(w(512), d(3), shortcut=False, name="bu4")(
            jnp.concatenate([
                ConvBnSiLU(w(256), 3, 2, name="d3")(h3, train), l4],
                axis=-1), train)
        n5 = block(w(1024), d(3), shortcut=False, name="bu5")(
            jnp.concatenate([
                ConvBnSiLU(w(512), 3, 2, name="d4")(n4, train), l5],
                axis=-1), train)
        return h3, n4, n5


class DetectHead(nn.Module):
    """Decoupled anchor-free head: cls logits + DFL box distribution.

    Channel widths follow Ultralytics Detect exactly (computed from the
    P3 channel count, shared by all levels) so checkpoints import 1:1.
    """

    cfg: YoloConfig

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cfg = self.cfg
        p3c = feats[0].shape[-1]
        c2 = max(16, p3c // 4, 4 * cfg.reg_max)
        c3 = max(p3c, min(cfg.num_classes, 100))
        outs = []
        for i, f in enumerate(feats):
            box = ConvBnSiLU(c2, 3, name=f"cv2.{i}.0")(f, train)
            box = ConvBnSiLU(c2, 3, name=f"cv2.{i}.1")(box, train)
            box = nn.Conv(4 * cfg.reg_max, (1, 1), name=f"cv2.{i}.2")(box)
            if cfg.flavour == "v11":
                # Detect(legacy=False): DWConv+1x1 pairs in the cls branch
                fc = f.shape[-1]
                cls = ConvBnSiLU(fc, 3, groups=fc,
                                 name=f"cv3.{i}.0.0")(f, train)
                cls = ConvBnSiLU(c3, 1, name=f"cv3.{i}.0.1")(cls, train)
                cls = ConvBnSiLU(c3, 3, groups=c3,
                                 name=f"cv3.{i}.1.0")(cls, train)
                cls = ConvBnSiLU(c3, 1, name=f"cv3.{i}.1.1")(cls, train)
            else:
                cls = ConvBnSiLU(c3, 3, name=f"cv3.{i}.0")(f, train)
                cls = ConvBnSiLU(c3, 3, name=f"cv3.{i}.1")(cls, train)
            cls = nn.Conv(cfg.num_classes, (1, 1), name=f"cv3.{i}.2")(cls)
            outs.append({"box": box, "cls": cls})
        return outs


class ProtoNet(nn.Module):
    """Ultralytics ``Proto``: conv3 -> learned 2x2/s2 transposed-conv
    upsample -> conv3 -> 1x1 Conv to num_protos (all Conv+BN+SiLU except
    the transpose)."""

    cfg: YoloConfig

    @nn.compact
    def __call__(self, p3, train: bool = False):
        c_ = self.cfg.proto_channels
        x = ConvBnSiLU(c_, 3, name="cv1")(p3, train)
        x = nn.ConvTranspose(c_, (2, 2), strides=(2, 2),
                             name="upsample")(x)
        x = ConvBnSiLU(c_, 3, name="cv2")(x, train)
        return ConvBnSiLU(self.cfg.num_protos, 1, name="cv3")(x, train)


class MaskCoeffHead(nn.Module):
    """Ultralytics ``Segment.cv4``: per-level 3-layer coefficient branch."""

    cfg: YoloConfig

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c4 = max(feats[0].shape[-1] // 4, self.cfg.num_protos)
        outs = []
        for i, f in enumerate(feats):
            h = ConvBnSiLU(c4, 3, name=f"cv4.{i}.0")(f, train)
            h = ConvBnSiLU(c4, 3, name=f"cv4.{i}.1")(h, train)
            outs.append(nn.Conv(self.cfg.num_protos, (1, 1),
                                name=f"cv4.{i}.2")(h))
        return outs


class YOLO(nn.Module):
    """Full detector; returns dense per-level raw outputs + optional protos."""

    cfg: YoloConfig = YoloConfig()

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict:
        H, W = images.shape[1:3]
        if H % 32 or W % 32:
            # the PAN neck's 2x upsample + skip concat requires exact
            # doubling between levels; Ultralytics rounds sizes to the
            # max stride for the same reason (check_imgsz). Fail with a
            # clear message instead of a shape error deep in the neck.
            raise ValueError(
                f"YOLO input size ({H}, {W}) must be a multiple of 32 "
                f"(pad or resize; see Ultralytics check_imgsz)")
        feats = Backbone(self.cfg, name="backbone")(images, train)
        neck = Neck(self.cfg, name="neck")(feats, train)
        outs = DetectHead(self.cfg, name="head")(neck, train)
        result = {"levels": outs}
        if self.cfg.seg:
            result["protos"] = ProtoNet(self.cfg, name="proto")(neck[0], train)
            result["mask_coeffs"] = MaskCoeffHead(self.cfg, name="mask_head")(
                neck, train)
        return result


# ---------------------------------------------------------------------------
# decoding


def anchor_points(img_size: Tuple[int, int],
                  strides: Sequence[int] = STRIDES,
                  level_hw: Optional[Sequence[Tuple[int, int]]] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All anchor centers (x, y) in pixels + per-anchor stride, concatenated
    over levels. Shapes: (A, 2), (A,).

    Pass ``level_hw`` (the actual feature-map (H, W) per level) for
    inputs not divisible by 32: the conv chain rounds UP per stride-2
    stage (SAME padding), so ``H // s`` undercounts and the anchors
    would misalign with the flattened level tensors.
    """
    pts, strs = [], []
    H, W = img_size
    for i, s in enumerate(strides):
        h, w = level_hw[i] if level_hw is not None else (H // s, W // s)
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * s
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * s
        grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([grid_x.reshape(-1), grid_y.reshape(-1)], -1))
        strs.append(jnp.full((h * w,), s, jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(strs)


def dfl_expectation(box_dist: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """(..., 4*reg_max) logits -> (..., 4) expected ltrb distances."""
    d = box_dist.reshape(box_dist.shape[:-1] + (4, reg_max))
    p = nn.softmax(d, axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(p * bins, axis=-1)


def decode_boxes(result: Dict, img_size: Tuple[int, int], cfg: YoloConfig
                 ) -> Dict[str, jnp.ndarray]:
    """Dense decode: per-anchor xyxy boxes + class probs (+ mask coeffs).

    Returns {"boxes": (B, A, 4), "scores": (B, A, nc)[, "coeffs": (B, A, P)]}.
    """
    boxes, scores, coeffs = [], [], []
    # anchors from the ACTUAL level shapes (not img_size // stride):
    # non-/32 inputs round up through the conv chain
    pts, strs = anchor_points(
        img_size,
        level_hw=[lvl["box"].shape[1:3] for lvl in result["levels"]])
    for i, lvl in enumerate(result["levels"]):
        B, H, W, _ = lvl["box"].shape
        box = dfl_expectation(lvl["box"].reshape(B, H * W, -1), cfg.reg_max)
        boxes.append(box)
        scores.append(nn.sigmoid(lvl["cls"].reshape(B, H * W, -1)))
        if cfg.seg:
            coeffs.append(result["mask_coeffs"][i].reshape(B, H * W, -1))
    box = jnp.concatenate(boxes, axis=1)           # ltrb in stride units
    ltrb = box * strs[None, :, None]
    x1y1 = pts[None] - ltrb[..., :2]
    x2y2 = pts[None] + ltrb[..., 2:]
    out = {"boxes": jnp.concatenate([x1y1, x2y2], axis=-1),
           "scores": jnp.concatenate(scores, axis=1),
           "anchor_points": pts, "anchor_strides": strs}
    if cfg.seg:
        out["coeffs"] = jnp.concatenate(coeffs, axis=1)
    return out


def assemble_masks(protos: jnp.ndarray, coeffs: jnp.ndarray,
                   boxes: jnp.ndarray, img_size: Tuple[int, int],
                   impl: str = "auto") -> jnp.ndarray:
    """Prototype mask decode: sigmoid(protos @ coeffs), cropped to boxes.

    protos (B, Hp, Wp, P); coeffs (B, K, P); boxes (B, K, 4) in image px.
    Returns (B, K, Hp, Wp) masks in [0, 1] (at proto resolution, /4).

    ``impl``: "auto" uses the fused Pallas kernel on TPU (one HBM pass
    instead of three materialized (B,K,Hp,Wp) intermediates —
    ops/pallas_mask.py), the XLA path elsewhere; "xla"/"pallas" force.
    """
    if impl == "pallas" or (impl == "auto"
                            and jax.default_backend() == "tpu"):
        from pautdx.ops.pallas_mask import pallas_assemble_masks

        return pallas_assemble_masks(protos, coeffs, boxes, tuple(img_size))
    m = jnp.einsum("bhwp,bkp->bkhw", protos, coeffs)
    m = nn.sigmoid(m)
    B, K, Hp, Wp = m.shape
    H, W = img_size
    sx, sy = Wp / W, Hp / H
    ys = jnp.arange(Hp, dtype=jnp.float32)[None, None, :, None]
    xs = jnp.arange(Wp, dtype=jnp.float32)[None, None, None, :]
    x1 = boxes[..., 0:1, None] * sx
    y1 = boxes[..., 1:2, None] * sy
    x2 = boxes[..., 2:3, None] * sx
    y2 = boxes[..., 3:4, None] * sy
    inside = ((xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2))
    return m * inside
