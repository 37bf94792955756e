"""SignalSequenceDetector (v1) and its Enhanced variant.

Equivalents of `SignalSequenceDetection/model.py:7-516` and
`enhanced_model.py:8-855` (SURVEY.md §2.3):

v1 forward for ``(B, L, S)``:
1. per-signal conv encoder 1->64->128->256 (k7/5/3) + adaptive pool + FC -> d=128
2. sinusoidal position encoding + 4-layer transformer over the sequence
3. BiGRU context aggregator; 'health profile' MLP
4. softmax attention over the sequence; enhanced = seq*attn + context
5. anomaly detector on [features ⊕ health] -> sigmoid score
6. detection head -> class logits (class 0 = Health) + sigmoid (start, end)
7. anomaly score added to the non-health logits

Enhanced adds: dilated multi-scale encoder, conv feature pyramid, BiLSTM +
learned-query attention aggregator, uncertainty heads (Softplus) on class
and position, cross-attention between signal features and context, and
confidence deflation by uncertainty at predict time
(`enhanced_model.py:741-807`).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from pautdx.nn.attention import SinusoidalPositionEncoding, TinyMHA
from pautdx.nn.blocks import (
    ConvStack1D, DilatedBranches1D, MLP, ResidualBlock1D, adaptive_avg_pool1d,
)
from pautdx.nn.recurrent import ContextAggregator, QueryAttentionAggregator
from pautdx.nn.transformer import Encoder


class SignalEncoder(nn.Module):
    """Per-signal conv stack -> fixed-d descriptor."""

    d_model: int = 128
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False):
        B, L, S = signals.shape
        x = signals.reshape(B * L, S, 1)
        x = ConvStack1D((64, 128, 256), (7, 5, 3), norm=self.norm,
                        name="conv")(x, train)
        x = adaptive_avg_pool1d(x, 4).reshape(B * L, -1)
        x = nn.Dense(self.d_model, name="fc")(x)
        return nn.relu(x).reshape(B, L, self.d_model)


class SignalSequenceDetector(nn.Module):
    num_classes: int = 2          # Health + defect types; class 0 = Health
    d_model: int = 128
    num_heads: int = 4
    num_layers: int = 4
    dropout: float = 0.1
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = SignalEncoder(self.d_model, self.norm, name="encoder")(
            signals, train)
        h = SinusoidalPositionEncoding(name="pos_enc")(feats)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, name="transformer")(h, train=train)
        context = ContextAggregator(self.d_model, name="context")(h)
        # PER-STEP health features from the transformer output (the
        # reference's health_extractor runs on sequence_features with no
        # pooling, `model.py:272-313`), d -> d/2 -> d/4 -> d, no final act
        health = MLP((self.d_model // 2, self.d_model // 4, self.d_model),
                     name="health_extractor")(h, train)
        # 2-layer attention scorer d -> d/4 -> 1 (`model.py:281-285`)
        attn = nn.softmax(
            MLP((self.d_model // 4, 1), name="seq_attention")(h, train),
            axis=-2)
        enhanced = h * attn + context

        anomaly_in = jnp.concatenate([enhanced, health], axis=-1)
        anomaly = nn.sigmoid(MLP((self.d_model, 1), name="anomaly")(
            anomaly_in, train)[..., 0])

        cls_logits = MLP((self.d_model, self.num_classes), name="class_head")(
            enhanced, train)
        positions = nn.sigmoid(MLP((self.d_model, 2), name="position_head")(
            enhanced, train))
        cls_logits = cls_logits.at[..., 1:].add(anomaly[..., None])
        return {"class_logits": cls_logits, "positions": positions,
                "anomaly": anomaly,
                "prob": 1.0 - nn.softmax(cls_logits, axis=-1)[..., 0]}


class EnhancedSignalSequenceDetector(nn.Module):
    num_classes: int = 2
    d_model: int = 256
    num_heads: int = 8
    num_layers: int = 6
    dropout: float = 0.1
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False) -> Dict[str, jnp.ndarray]:
        B, L, S = signals.shape
        x = signals.reshape(B * L, S, 1)
        x = DilatedBranches1D(self.d_model // 8, name="multi_scale")(x, train)
        x = ResidualBlock1D(self.d_model // 2, dilation=2, norm=self.norm,
                            name="res1")(x, train)
        # 3-scale pyramid: stride-2 convs, pooled + concatenated
        p1 = x
        p2 = nn.Conv(self.d_model // 2, (3,), strides=(2,), name="down1")(p1)
        p3 = nn.Conv(self.d_model // 2, (3,), strides=(2,), name="down2")(p2)
        pooled = jnp.concatenate(
            [p.mean(axis=-2) for p in (p1, p2, p3)], axis=-1)
        feats = nn.relu(nn.Dense(self.d_model, name="fuse")(pooled))
        feats = feats.reshape(B, L, self.d_model)

        h = SinusoidalPositionEncoding(name="pos_enc")(feats)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, name="transformer")(h, train=train)
        per_step, pooled_ctx = QueryAttentionAggregator(
            self.d_model, self.num_heads // 2, name="context")(h, train=train)
        cross = TinyMHA(self.num_heads, name="cross_attn")(h, per_step,
                                                           train=train)
        fused = nn.relu(nn.Dense(self.d_model, name="integrate")(
            jnp.concatenate([h, cross], axis=-1)))

        cls_logits = MLP((self.d_model, self.num_classes), name="class_head")(
            fused, train)
        cls_unc = nn.softplus(MLP((64, 1), name="class_uncertainty")(
            fused, train)[..., 0])
        positions = nn.sigmoid(MLP((self.d_model, 2), name="position_head")(
            fused, train))
        pos_unc = nn.softplus(MLP((64, 2), name="position_uncertainty")(
            fused, train))
        anomaly_in = jnp.concatenate(
            [fused, jnp.broadcast_to(pooled_ctx[..., None, :], fused.shape)],
            axis=-1)
        anomaly = nn.sigmoid(MLP((self.d_model, 1), name="anomaly")(
            anomaly_in, train)[..., 0])
        cls_logits = cls_logits.at[..., 1:].add(anomaly[..., None])
        probs = nn.softmax(cls_logits, axis=-1)
        confidence = (1.0 - probs[..., 0]) / (1.0 + cls_unc)
        return {"class_logits": cls_logits, "positions": positions,
                "anomaly": anomaly, "class_uncertainty": cls_unc,
                "position_uncertainty": pos_unc, "prob": confidence}
