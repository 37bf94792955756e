"""The detection-model zoo — per-signal binary detectors.

Equivalents of `signals/improved_multisignal/detection_models/*.py`
(SURVEY.md §2.5). Each takes ``(B, N, S)`` and returns per-signal defect
probabilities ``(B, N)`` (positions too where the reference has them).
The model-zoo registry at the bottom mirrors the reference's trainer dict
(`train_detection.py:239-252`).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from pautdx.models.signal.enhanced_position import (
    EnhancedPositionMSC, FixedEnhancedPositionMSC, HybridModel,
)
from pautdx.models.signal.hybrid_binary import HybridBinaryModel
from pautdx.models.signal.msc import (
    ConvMultiSignalClassifier, MultiSignalClassifier, SetTransformer,
    SignalClassifierMLP,
)
from pautdx.models.signal.msc_n import MSC3Out, MSC_N, ImprovedMSC
from pautdx.models.signal.two_stage import TwoStageDetector
from pautdx.nn.attention import RelativePositionEncoding
from pautdx.nn.blocks import (
    ConvStack1D, MLP, MultiScaleConv1D, RMSNorm, SqueezeExcite1D,
    adaptive_avg_pool1d,
)
from pautdx.nn.transformer import Encoder


class SimpleDetectionModel(nn.Module):
    """Linear projection + deep/wide transformer
    (`simple_detection_model.py:6-63`: 8 layers, 16 heads, learned PE 1000)."""

    d_model: int = 128
    num_heads: int = 16
    num_layers: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, signals, train: bool = False):
        h = nn.Dense(self.d_model, name="proj")(signals)
        h = RelativePositionEncoding(1000, name="pos_enc")(h)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, name="encoder")(h, train=train)
        return nn.sigmoid(nn.Dense(1, name="head")(h)[..., 0])


class ComplexDetectionModel(nn.Module):
    """Multi-scale conv (k3/7/15) + pool-to-128 + 4-layer transformer
    (`complex_detection_model.py:6-96`)."""

    d_model: int = 128
    num_heads: int = 8
    num_layers: int = 4
    dropout: float = 0.1
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False):
        B, N, S = signals.shape
        x = signals.reshape(B * N, S, 1)
        x = MultiScaleConv1D(32, (3, 7, 15), norm=self.norm, name="ms")(x, train)
        x = adaptive_avg_pool1d(x, 128)
        x = x.mean(axis=-1)                      # (B*N, 128)
        h = x.reshape(B, N, 128)
        h = nn.Dense(self.d_model, name="proj")(h)
        h = RelativePositionEncoding(1000, name="pos_enc")(h)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, name="encoder")(h, train=train)
        return nn.sigmoid(MLP((64, 1), dropout=self.dropout, name="head")(
            h, train)[..., 0])


class NoiseRobustModel(nn.Module):
    """Large-kernel denoising front end (k7/5/9/17/5)
    (`noise_robust_tr2.py:11-118`)."""

    d_model: int = 128
    num_heads: int = 8
    num_layers: int = 4
    dropout: float = 0.15
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False):
        B, N, S = signals.shape
        x = signals.reshape(B * N, S, 1)
        x = ConvStack1D((16, 32, 32, 64, 64), (7, 5, 9, 17, 5),
                        norm=self.norm, name="denoise")(x, train)
        x = adaptive_avg_pool1d(x, 128).mean(axis=-1)
        h = x.reshape(B, N, 128)
        if self.d_model != 128:
            # the pooled descriptor is 128-wide; a non-default d_model
            # needs a projection or the encoder silently runs at 128
            # while ffn_dim/heads follow d_model
            h = nn.Dense(self.d_model, name="proj")(h)
        h = RelativePositionEncoding(1200, name="pos_enc")(h)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, flavour="hybrid", name="encoder")(
            h, train=train)
        return nn.sigmoid(nn.Dense(1, name="head")(h)[..., 0])


class DirectDefectModel(nn.Module):
    """4-conv stack + deep projection + wide-FFN transformer + deep classifier
    (`direct_defect.py:6-122`)."""

    d_model: int = 128
    num_heads: int = 8
    num_layers: int = 3
    dropout: float = 0.15
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False):
        B, N, S = signals.shape
        x = signals.reshape(B * N, S, 1)
        x = ConvStack1D((32, 64, 64, 64), (3, 3, 5, 5), norm=self.norm,
                        dropout=self.dropout, name="conv")(x, train)
        x = adaptive_avg_pool1d(x, 128).mean(axis=-1)
        h = MLP((256, 192, self.d_model), dropout=self.dropout,
                name="projection")(x, train)
        h = h.reshape(B, N, self.d_model)
        h = RelativePositionEncoding(1200, name="pos_enc")(h)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, name="encoder")(h, train=train)
        return nn.sigmoid(MLP((128, 64, 1), dropout=self.dropout,
                              name="classifier")(h, train)[..., 0])


class FluctuationRobustModel(nn.Module):
    """Small-kernel conv + 6-layer/12-head transformer
    (`fluctuation_robust.py:6-104`)."""

    d_model: int = 96
    num_heads: int = 12
    num_layers: int = 6
    dropout: float = 0.1
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False):
        B, N, S = signals.shape
        x = signals.reshape(B * N, S, 1)
        x = ConvStack1D((16, 32, 48), (3, 3, 3), norm=self.norm,
                        name="conv")(x, train)
        x = x.mean(axis=-2)
        h = nn.Dense(self.d_model, name="proj")(x).reshape(B, N, self.d_model)
        h = RelativePositionEncoding(1000, name="pos_enc")(h)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, name="encoder")(h, train=train)
        return nn.sigmoid(nn.Dense(1, name="head")(h)[..., 0])


class PatternEmbeddingModel(nn.Module):
    """Learnable background reference; classification from similarity
    (`pattern_embedding.py:6-125`)."""

    d_model: int = 128
    num_heads: int = 8
    num_layers: int = 2
    dropout: float = 0.1
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False):
        B, N, S = signals.shape
        x = signals.reshape(B * N, S, 1)
        x = ConvStack1D((32, 64), (5, 5), norm=self.norm, name="conv")(x, train)
        x = x.mean(axis=-2)
        h = nn.Dense(self.d_model, name="proj")(x).reshape(B, N, self.d_model)
        ref = self.param("background_reference",
                         nn.initializers.normal(0.02), (self.d_model,))
        sim = jnp.sum(h * ref, axis=-1, keepdims=True) / (
            jnp.linalg.norm(h, axis=-1, keepdims=True)
            * jnp.linalg.norm(ref) + 1e-8)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, name="encoder")(h, train=train)
        return nn.sigmoid(MLP((64, 1), name="head")(
            jnp.concatenate([h, sim], axis=-1), train)[..., 0])


class EnhancedPatternModel(nn.Module):
    """5 background prototypes + softmax similarity + defect discriminator +
    fusion head (`enhanced_pattern.py:6-153`)."""

    d_model: int = 128
    num_heads: int = 8
    num_layers: int = 2
    num_prototypes: int = 5
    dropout: float = 0.1
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False):
        B, N, S = signals.shape
        x = signals.reshape(B * N, S, 1)
        x = ConvStack1D((32, 64), (5, 5), norm=self.norm, name="conv")(x, train)
        x = x.mean(axis=-2)
        h = nn.Dense(self.d_model, name="proj")(x).reshape(B, N, self.d_model)
        protos = self.param("background_prototypes",
                            nn.initializers.normal(0.02),
                            (self.num_prototypes, self.d_model))
        sim = jnp.einsum("bnd,pd->bnp", h, protos) / (
            jnp.linalg.norm(h, axis=-1, keepdims=True)
            * jnp.linalg.norm(protos, axis=-1) + 1e-8)
        sim = nn.softmax(sim, axis=-1)
        bg = jnp.einsum("bnp,pd->bnd", sim, protos)
        disc = MLP((64, self.d_model), name="discriminator")(h - bg, train)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, name="encoder")(h, train=train)
        fused = jnp.concatenate([h, disc, sim], axis=-1)
        return nn.sigmoid(MLP((128, 1), name="fusion_head")(fused, train)[..., 0])


class PositionLocalizationModel(nn.Module):
    """Position-only dual head (`position_localization.py:65-196`).
    Returns {"positions", "prob"} with prob=1 placeholderless confidence."""

    d_model: int = 128
    num_heads: int = 8
    num_layers: int = 3
    dropout: float = 0.15
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False) -> Dict[str, jnp.ndarray]:
        B, N, S = signals.shape
        x = signals.reshape(B * N, S, 1)
        x = ConvStack1D((32, 64, 64), (3, 5, 5), norm=self.norm,
                        name="conv")(x, train)
        x = adaptive_avg_pool1d(x, 128).mean(axis=-1)
        h = nn.Dense(self.d_model, name="proj")(x).reshape(B, N, self.d_model)
        h = RelativePositionEncoding(1200, name="pos_enc")(h)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, name="encoder")(h, train=train)
        start = nn.sigmoid(MLP((64, 1), name="start_head")(h, train)[..., 0])
        width = nn.sigmoid(MLP((64, 1), name="width_head")(h, train)[..., 0])
        end = jnp.clip(start + width, 0.0, 1.0)
        return {"positions": jnp.stack([start, end], axis=-1),
                "prob": jnp.ones_like(start)}


class ModernHybridBinary(nn.Module):
    """RMSNorm + squeeze-excite + depthwise local mixing modernization
    (`new shit model/shit1.py:6-75`)."""

    d_model: int = 128
    num_heads: int = 8
    num_layers: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, signals, train: bool = False):
        B, N, S = signals.shape
        x = signals.reshape(B * N, S, 1)
        x = nn.Conv(32, (3,), padding="SAME", name="conv1")(x)
        x = nn.silu(RMSNorm(name="rms1")(x))
        x = SqueezeExcite1D(name="se1")(x)
        x = nn.Conv(64, (5,), padding="SAME", name="conv2")(x)
        x = nn.silu(RMSNorm(name="rms2")(x))
        x = SqueezeExcite1D(name="se2")(x)
        x = adaptive_avg_pool1d(x, 128).mean(axis=-1)
        seq = x.reshape(B, N, 128)
        seq_mean = seq.mean(axis=1, keepdims=True)
        h = nn.Dense(self.d_model, name="proj")(
            jnp.concatenate([seq, seq - seq_mean], axis=-1))
        h = RelativePositionEncoding(1200, name="pos_enc")(h)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, flavour="hybrid", name="encoder")(
            h, train=train)
        return nn.sigmoid(nn.Dense(1, name="head")(h)[..., 0])


# Registry mirroring the reference's model-zoo dict (`train_detection.py:239-252`).
MODEL_ZOO = {
    "Simple": SimpleDetectionModel,
    "Complex": ComplexDetectionModel,
    "NoiseRobust": NoiseRobustModel,
    "DirectDefect": DirectDefectModel,
    "FluctuationRobust": FluctuationRobustModel,
    "PatternEmbedding": PatternEmbeddingModel,
    "EnhancedPattern": EnhancedPatternModel,
    "PositionLocalization": PositionLocalizationModel,
    "HybridBinary": HybridBinaryModel,
    "ModernHybridBinary": ModernHybridBinary,
    "MSC": MultiSignalClassifier,
    "ConvMSC": ConvMultiSignalClassifier,
    "MSC3Out": MSC3Out,
    "MSC_N": MSC_N,
    "ImprovedMSC": ImprovedMSC,
    "EnhancedPosition": EnhancedPositionMSC,
    "FixedEnhancedPosition": FixedEnhancedPositionMSC,
    "Hybrid": HybridModel,
    "TwoStage": TwoStageDetector,
    "SetTransformer": SetTransformer,
    "MLP": SignalClassifierMLP,
}
