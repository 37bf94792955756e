"""Reusable 1D conv building blocks (flax.linen).

Behavioural equivalents (not translations) of the blocks repeated across the
reference's signal models (SURVEY.md §2.3-2.5): conv+BN+ReLU stacks,
background extractors (depthwise smoothing subtracted from features),
multi-scale parallel convolutions, squeeze-excitation, RMSNorm, and residual
dilated blocks.

Layout convention: all sequence tensors are channels-last ``(..., length,
features)`` (NWC) — XLA's native conv layout on TPU.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Norm1D(nn.Module):
    """Switchable normalization: 'batch' for checkpoint parity with the
    reference's BatchNorm1d, 'group' as the TPU-friendly default-free option
    (SURVEY.md §7 'Hard parts')."""

    kind: str = "batch"
    groups: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "batch":
            return nn.BatchNorm(use_running_average=not train, axis_name=None)(x)
        if self.kind == "group":
            g = min(self.groups, x.shape[-1])
            while x.shape[-1] % g:
                g -= 1
            return nn.GroupNorm(num_groups=g)(x)
        if self.kind == "layer":
            return nn.LayerNorm()(x)
        if self.kind == "none":
            return x          # reference MSC/MSC_N conv stacks have no norm
        raise ValueError(f"unknown norm kind {self.kind!r}")


class ConvBlock1D(nn.Module):
    """Conv1d -> norm -> ReLU (the reference's ubiquitous conv+BN+ReLU)."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    norm: str = "batch"
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel_size,), strides=(self.stride,),
                    kernel_dilation=(self.dilation,), padding="SAME")(x)
        x = Norm1D(self.norm)(x, train)
        return self.act(x)


class ConvStack1D(nn.Module):
    """A sequence of ConvBlock1D with optional trailing dropout.

    E.g. the HybridBinary/direct_defect extractor 1->32->64->64 k3/3/5
    (`hybrid_binary.py:92-105`).
    """

    features: Sequence[int]
    kernels: Sequence[int]
    norm: str = "batch"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f, k in zip(self.features, self.kernels):
            x = ConvBlock1D(f, k, norm=self.norm)(x, train)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class DepthwiseConv1D(nn.Module):
    """Depthwise (grouped, groups=channels) 1D convolution."""

    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return nn.Conv(c, (self.kernel_size,), padding="SAME",
                       kernel_dilation=(self.dilation,), feature_group_count=c)(x)


class BackgroundExtractor(nn.Module):
    """Subtract a depthwise low-pass 'background' estimate from features.

    The MSC_N idea (`signals/multisignalNN/NN_models.py:225-246`): a wide
    depthwise conv over the sample axis of the conv FEATURES estimates the
    slowly varying background, which is subtracted to highlight defects.
    ``chained=True`` is the EnhancedPosition form — the kernels run
    SEQUENTIALLY with a norm between (k15 -> BN -> k31,
    `enhanced_position_model.py:87-91`); otherwise multiple kernels
    average in parallel.
    """

    kernel_sizes: Tuple[int, ...] = (15,)
    chained: bool = False
    norm: str = "batch"        # between chained convs only

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.chained:
            bg = x
            for i, k in enumerate(self.kernel_sizes):
                bg = DepthwiseConv1D(k, name=f"bg_k{k}")(bg)
                if i < len(self.kernel_sizes) - 1:
                    bg = Norm1D(self.norm)(bg, train)
            return x - bg
        bg = jnp.zeros_like(x)
        for k in self.kernel_sizes:
            bg = bg + DepthwiseConv1D(k, name=f"bg_k{k}")(x)
        return x - bg / len(self.kernel_sizes)


class MultiScaleConv1D(nn.Module):
    """Parallel convs with different kernel sizes, concatenated
    (`two_stage_model.py:38-122` kernels 3/5/7/11;
    `complex_detection_model.py` kernels 3/7/15)."""

    features: int
    kernel_sizes: Sequence[int] = (3, 5, 7, 11)
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = [
            ConvBlock1D(self.features, k, norm=self.norm, name=f"branch_k{k}")(
                x, train)
            for k in self.kernel_sizes
        ]
        return jnp.concatenate(branches, axis=-1)


class DilatedBranches1D(nn.Module):
    """Parallel dilated convs d=1/2/4/8 (`enhanced_model.py:61-89`)."""

    features: int
    dilations: Sequence[int] = (1, 2, 4, 8)
    kernel_size: int = 3
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = [
            ConvBlock1D(self.features, self.kernel_size, dilation=d,
                        norm=self.norm, name=f"dil_{d}")(x, train)
            for d in self.dilations
        ]
        return jnp.concatenate(branches, axis=-1)


class ResidualBlock1D(nn.Module):
    """Residual dilated conv block (`enhanced_model.py:92-140`)."""

    features: int
    kernel_size: int = 3
    dilation: int = 1
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBlock1D(self.features, self.kernel_size, dilation=self.dilation,
                        norm=self.norm)(x, train)
        h = nn.Conv(self.features, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="SAME")(h)
        h = Norm1D(self.norm)(h, train)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1,))(x)
        return nn.relu(x + h)


class SqueezeExcite1D(nn.Module):
    """SE channel gating (`new shit model/shit1.py:6-75`)."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=-2, keepdims=True)
        s = nn.relu(nn.Dense(max(1, c // self.reduction))(s))
        s = nn.sigmoid(nn.Dense(c)(s))
        return x * s


class RMSNorm(nn.Module):
    """Root-mean-square norm (`shit1.py`)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(ms + self.eps) * scale


class MLP(nn.Module):
    """Dense stack with ReLU + optional dropout between layers."""

    features: Sequence[int]
    dropout: float = 0.0
    final_act: Callable | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            last = i == len(self.features) - 1
            if not last:
                x = nn.relu(x)
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.final_act is not None:
            x = self.final_act(x)
        return x


def adaptive_avg_pool1d(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """(..., L, C) -> (..., out_len, C), EXACT torch AdaptiveAvgPool1d
    semantics: output bin i averages input [floor(i*L/out),
    ceil((i+1)*L/out)) — the canonical reference models pool with
    ``nn.AdaptiveAvgPool1d(128)`` (`complex_detection_model.py:34`), and
    at the shipped signal lengths (320, 360) the bins are NON-uniform
    (size 2-3), which a linear resample does not reproduce.

    Non-divisible case runs as one (out, L) averaging-matrix matmul —
    shapes are static, so the matrix is a trace-time constant and the op
    lands on the MXU."""
    L = x.shape[-2]
    if L % out_len == 0:
        k = L // out_len
        shape = x.shape[:-2] + (out_len, k, x.shape[-1])
        return x.reshape(shape).mean(axis=-2)
    idx = np.arange(out_len)
    starts = np.floor(idx * L / out_len).astype(np.int64)
    ends = np.ceil((idx + 1) * L / out_len).astype(np.int64)
    mat = np.zeros((out_len, L), np.float32)
    for i in range(out_len):
        mat[i, starts[i]:ends[i]] = 1.0 / (ends[i] - starts[i])
    m = jnp.asarray(mat, x.dtype)
    return jnp.einsum("ol,...lc->...oc", m, x)
