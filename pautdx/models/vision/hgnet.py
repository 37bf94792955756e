"""HGNetV2 backbone in JAX — the D-FINE conv encoder.

Architecture-exact re-implementation of the HGNetV2 used by HF D-FINE
(the reference's backbone via `transformers`, SURVEY.md §2.2 dependency
note): stem with dual-path 2x2 convs, stages of HG basic layers (dense
conv aggregation + squeeze/excitation 1x1s), optional light blocks
(1x1 + depthwise k), learnable affine blocks after activations.

Module names mirror the torch implementation so
``pautdx.compat.dfine_import`` can convert HF checkpoints mechanically
(layout NHWC here vs torch NCHW).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pautdx.ops.qconv import (
    int8_conv, shared_conv_kernel, sow_calibration, wants_int8,
)


@dataclasses.dataclass(frozen=True)
class HGNetConfig:
    stem_channels: Tuple[int, int, int] = (3, 16, 16)
    stage_in_channels: Tuple[int, ...] = (16, 64, 128, 256)
    stage_mid_channels: Tuple[int, ...] = (16, 32, 64, 128)
    stage_out_channels: Tuple[int, ...] = (64, 128, 256, 512)
    stage_num_blocks: Tuple[int, ...] = (1, 1, 2, 1)
    stage_num_layers: Tuple[int, ...] = (3, 3, 3, 3)
    stage_downsample: Tuple[bool, ...] = (False, True, True, True)
    stage_light_block: Tuple[bool, ...] = (False, False, True, True)
    stage_kernel_size: Tuple[int, ...] = (3, 3, 5, 5)
    use_learnable_affine_block: bool = True
    out_indices: Tuple[int, ...] = (1, 2, 3)      # stages feeding the neck
    # "hgnet": the reference dual-path stem (checkpoint parity).
    # "patchify": single k4/s4 conv — TPU-friendly (no 2x2 VALID convs,
    # no stride-1 maxpool, no layout churn at full resolution); for
    # pautdx-native presets only.
    # "patchify8": single k8/s8 conv straight to stride 8, skipping the
    # first ``start_stage`` stages entirely — removes ALL 160x160/80x80
    # narrow-channel conv work (the model is HBM-bound and those stages
    # are mostly layout churn + half-empty lanes at serving batch).
    stem: str = "hgnet"
    # patchify stems only: express the patch conv as space-to-depth +
    # matmul (identical math and params; avoids XLA's conv input-layout
    # copy — see _S2DProj)
    stem_s2d: bool = False
    # raw-uint8 serving only: materialize the dequantized bf16 PATCHES
    # (an optimization_barrier after the cast) instead of letting XLA
    # fuse the u8->bf16 convert into the stem matmul's operand load.
    # The round-4 raw-u8 measurement was a 2.3% slowdown precisely
    # because of that fusion (slow u8-convert operand path on the MXU);
    # this splits it: the s2d copy moves 1-byte elements, one convert
    # pass writes bf16 patches in the matmul's preferred lane-aligned
    # layout (192 channels, vs the 3-channel image), and the matmul
    # reads plain bf16.
    stem_u8_materialize: bool = False
    # s2d stems only: lowering variant for the patch rearrangement.
    # "transpose" (default): reshape/transpose/reshape — XLA emits the
    # input relayout + a 6D patch copy (the top two ops of the round-5
    # 640px serving profile). "slices": 64 strided slices
    # x[:, ki::p, kj::p, :] concatenated on channels — a different XLA
    # lowering of the same math (params interchangeable; the flatten
    # order (ki, kj, c) matches). Measured per-config on chip.
    # (A VMEM-resident Pallas patchify was tried in round 5 and is NOT
    # expressible: the rearrangement crosses the sublane/lane split and
    # Mosaic rejects it — "infer-vector-layout: unsupported shape
    # cast"; that crossing is exactly what XLA's HBM copy implements.)
    stem_s2d_impl: str = "transpose"
    # s2d stems only, serving wire-format option: the input arrives
    # ALREADY patchified — (B, H/p, W/p, p*p*C) instead of (B, H, W, C)
    # — and the stem skips the rearrangement entirely. The patchify is a
    # pure per-frame permutation the serving host performs on the uint8
    # wire bytes (`pautdx.serve.throughput.prepatchify_uint8`), so the
    # device-side patch copy — the top two ops of the round-5 640px
    # serving profile, both at their HBM relayout floor — never runs.
    # Same params, bit-identical outputs (the (ki, kj, c) flatten order
    # matches _S2DProj's transpose lowering); gated by
    # tests/test_serve.py::test_prepatchified_stem_exact.
    stem_pre_patchified: bool = False
    # first stage to run (patchify8 presets set 2: the stem already
    # provides that stage's input stride and channel count)
    start_stage: int = 0

    @property
    def out_channels(self) -> List[int]:
        return [self.stage_out_channels[i] for i in self.out_indices]

    def __post_init__(self):
        if any(i < self.start_stage for i in self.out_indices):
            raise ValueError(
                f"out_indices {self.out_indices} select stages below "
                f"start_stage={self.start_stage}, which are skipped by the "
                f"'{self.stem}' stem and would yield no feature map")
        if self.stem_pre_patchified and not self.stem_s2d:
            raise ValueError(
                "stem_pre_patchified is a wire-format option of the "
                "space-to-depth stem (stem_s2d=True); the nn.Conv stem "
                "consumes images, not patch slabs")
        if self.start_stage > 0 and self.stem != "patchify8":
            # only the patchify8 stem emits stage_in_channels[start_stage]
            # at the right stride; other stems feed stage 0's channels and
            # would fail with an opaque grouped-conv divisibility error
            raise ValueError(
                f"start_stage={self.start_stage} requires stem='patchify8' "
                f"(got '{self.stem}': its output feeds stage 0)")


class LearnableAffine(nn.Module):
    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (1,))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        return scale * x + bias


class ConvLayer(nn.Module):
    """conv (no bias) + BN + act (+ learnable affine)."""

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: bool = True
    lab: bool = False
    padding: Optional[str] = "SAME"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.padding == "SAME":
            # torch symmetric padding (k-1)//2 — differs from XLA SAME for
            # stride>1; required for checkpoint parity
            p = (self.kernel - 1) // 2
            pad = ((p, p), (p, p))
        else:
            pad = self.padding
        sow_calibration(self, x)
        if wants_int8(self, train, "convolution"):
            # activation-int8 serving (pautdx.serve.quantize): same kernel
            # param, s8 x s8 -> s32 conv, calibrated per-tensor input scale
            kernel = shared_conv_kernel(self, "convolution")
            x = int8_conv(x, kernel, strides=(self.stride, self.stride),
                          padding=pad, groups=self.groups,
                          in_scale=self.get_variable("quant", "in_scale"))
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride), padding=pad,
                        feature_group_count=self.groups, use_bias=False,
                        name="convolution")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         name="normalization")(x)
        if self.act:
            x = nn.relu(x)
            if self.lab:
                x = LearnableAffine(name="lab")(x)
        return x


class ConvLayerLight(nn.Module):
    features: int
    kernel: int
    lab: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvLayer(self.features, 1, act=False, name="conv1")(x, train)
        x = ConvLayer(self.features, self.kernel, groups=self.features,
                      lab=self.lab, name="conv2")(x, train)
        return x


class Embeddings(nn.Module):
    """HGNetV2 stem: stride-2 conv, dual path (2x2 convs vs maxpool), merge."""

    cfg: HGNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = self.cfg.stem_channels[1]
        lab = self.cfg.use_learnable_affine_block
        x = ConvLayer(c1, 3, stride=2, lab=lab, name="stem1")(x, train)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        a = ConvLayer(c1 // 2, 2, padding="VALID", lab=lab,
                      name="stem2a")(x, train)
        a = jnp.pad(a, ((0, 0), (0, 1), (0, 1), (0, 0)))
        a = ConvLayer(c1, 2, padding="VALID", lab=lab, name="stem2b")(a, train)
        p = nn.max_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        x = jnp.concatenate([p, a], axis=-1)
        x = ConvLayer(c1, 3, stride=2, lab=lab, name="stem3")(x, train)
        x = ConvLayer(self.cfg.stem_channels[2], 1, lab=lab,
                      name="stem4")(x, train)
        return x


class BasicLayer(nn.Module):
    mid: int
    out: int
    num_layers: int
    kernel: int
    light: bool
    residual: bool
    lab: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        outs = [x]
        h = x
        for i in range(self.num_layers):
            if self.light:
                h = ConvLayerLight(self.mid, self.kernel, lab=self.lab,
                                   name=f"layers.{i}")(h, train)
            else:
                h = ConvLayer(self.mid, self.kernel, lab=self.lab,
                              name=f"layers.{i}")(h, train)
            outs.append(h)
        h = jnp.concatenate(outs, axis=-1)
        h = ConvLayer(self.out // 2, 1, lab=self.lab,
                      name="aggregation.0")(h, train)
        h = ConvLayer(self.out, 1, lab=self.lab, name="aggregation.1")(h, train)
        if self.residual:
            h = h + identity
        return h


class Stage(nn.Module):
    cfg: HGNetConfig
    idx: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        i = self.idx
        if c.stage_downsample[i]:
            x = ConvLayer(c.stage_in_channels[i], 3, stride=2,
                          groups=c.stage_in_channels[i], act=False,
                          name="downsample")(x, train)
        for b in range(c.stage_num_blocks[i]):
            x = BasicLayer(c.stage_mid_channels[i], c.stage_out_channels[i],
                           c.stage_num_layers[i], c.stage_kernel_size[i],
                           c.stage_light_block[i], residual=(b != 0),
                           lab=c.use_learnable_affine_block,
                           name=f"blocks.{b}")(x, train)
        return x


class _S2DProj(nn.Module):
    """The patchify conv as space-to-depth + matmul.

    A k=p/s=p conv is exactly a non-overlapping patch extraction followed
    by a (p*p*C, f) matmul. Writing it that way lets XLA fuse the patch
    reshape/transpose into the preceding elementwise ops instead of
    emitting a separate input-layout copy before a convolution (the top
    op in the 640px serving profile, ~0.6 ms/iter at b32). The param
    keeps the conv kernel shape (p, p, C, f) — checkpoints are
    interchangeable with the nn.Conv path; (kh, kw, in) row-major
    flattening matches the (p, p, C) patch flattening below.
    """

    patch: int
    features: int
    u8_materialize: bool = False
    impl: str = "transpose"
    pre_patchified: bool = False

    @nn.compact
    def __call__(self, x):
        p, f = self.patch, self.features
        B, H, W, C = x.shape
        if self.pre_patchified:
            # wire format: the host already ran prepatchify_uint8 — the
            # last axis IS the (ki, kj, c)-flattened patch; no device-side
            # rearrangement (see HGNetConfig.stem_pre_patchified)
            if C % (p * p):
                raise ValueError(
                    f"pre-patchified stem input's last axis must be "
                    f"patch*patch*channels (patch={p}), got {C}")
            C = C // (p * p)
        elif H % p or W % p:
            # the nn.Conv path would silently SAME-pad odd sizes; here the
            # reshape below would fail with an opaque shape error instead
            raise ValueError(
                f"space-to-depth stem requires input H/W divisible by the "
                f"patch size {p}, got {H}x{W}; pad the input or use the "
                f"conv stem (stem_s2d=False)")
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, C, f))
        if self.pre_patchified:
            pass                 # x already (B, H/p, W/p, p*p*C)
        elif self.impl == "slices":
            # 64 strided views concatenated on channels, (ki, kj, c)
            # order — same math/params as the transpose lowering, but
            # XLA lowers it as slice fusions instead of the 6D patch
            # copy (which of the two wins is config- and batch-
            # dependent; measured on chip, PERF_SERVING_R5.json)
            x = jnp.concatenate(
                [x[:, ki::p, kj::p, :] for ki in range(p)
                 for kj in range(p)], axis=-1)
        else:
            x = x.reshape(B, H // p, p, W // p, p, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, H // p, W // p, p * p * C)
        if jnp.issubdtype(x.dtype, jnp.integer):
            # raw-uint8 serving (fold_uint8_stem): the patch reshape/
            # transpose above moved 1-byte elements (4x less HBM traffic
            # than bf16) and the convert lands HERE, where XLA fuses it
            # into the matmul's operand load — no dequantized image is
            # ever materialized. The 1/255 scale lives pre-folded in the
            # kernel, so u8 @ (K/255) == (u8/255) @ K exactly.
            x = x.astype(kernel.dtype)
            if self.u8_materialize:
                # force the converted patches into HBM instead of fusing
                # the convert into the matmul operand load (see
                # HGNetConfig.stem_u8_materialize)
                x = jax.lax.optimization_barrier(x)
        # otherwise no explicit cast: dtype promotion matches the nn.Conv
        # path (bf16 serving casts the kernel to bf16 with every other
        # param)
        return x @ kernel.reshape(p * p * C, f)


class PatchifyStem(nn.Module):
    """k/s patchify stem — MXU/lane-friendly single conv (or the
    equivalent space-to-depth matmul, ``cfg.stem_s2d``)."""

    cfg: HGNetConfig
    patch: int = 4
    features: int = 0            # 0 -> stem_channels[2]

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features or self.cfg.stem_channels[2]
        p = self.patch
        if self.cfg.stem_s2d:
            x = _S2DProj(patch=p, features=f, name="proj",
                         u8_materialize=self.cfg.stem_u8_materialize,
                         impl=self.cfg.stem_s2d_impl,
                         pre_patchified=self.cfg.stem_pre_patchified)(x)
        else:
            x = nn.Conv(f, (p, p), strides=(p, p),
                        use_bias=False, name="proj")(x)
        x = nn.BatchNorm(use_running_average=not train, name="norm")(x)
        return nn.relu(x)


class HGNetV2(nn.Module):
    """Returns the feature maps of ``cfg.out_indices`` stages (NHWC)."""

    cfg: HGNetConfig = HGNetConfig()

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        c = self.cfg
        start = c.start_stage
        if c.stem == "patchify":
            x = PatchifyStem(c, name="patch_embedder")(x, train)
        elif c.stem == "patchify8":
            # one conv straight to the input stride/channels of stage
            # ``start``: 4 (stem) doubled per skipped downsampling stage
            patch = 4
            for i in range(start):
                if c.stage_downsample[i]:
                    patch *= 2
            x = PatchifyStem(c, patch=patch,
                             features=c.stage_in_channels[start],
                             name="patch_embedder")(x, train)
        else:
            x = Embeddings(c, name="embedder")(x, train)
        feats: List = [None] * start
        for i in range(start, len(c.stage_in_channels)):
            x = Stage(c, i, name=f"encoder.stages.{i}")(x, train)
            feats.append(x)
        return [feats[i] for i in c.out_indices]
