"""Attention primitives and position encodings (flax.linen).

Equivalents of the reference's attention vocabulary:
- ``TinyMHA``        — explicit-QKV multi-head attention
  (`hybrid_binary_dynamic.py:82-108`); also the import target for torch
  ``nn.MultiheadAttention`` checkpoints (in_proj split handled in compat).
- ``LocalAttention`` — depthwise conv "attention" over the sequence axis,
  k11 then k5 (`hybrid_binary.py:18-44`), MSC_N's k5 variant.
- ``RelativePositionEncoding`` — learned additive embeddings
  (`hybrid_binary.py:7-15`, max_len 1200).
- ``SinusoidalPositionEncoding`` — `SignalSequenceDetection/model.py:84-102`.

All attention maths runs as batched matmuls in bf16-friendly form so XLA
tiles it onto the MXU; sequence lengths here are <= a few hundred, so flash
attention machinery is unnecessary — plain fused softmax-attention is
already compute-bound at these sizes.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pautdx.nn.blocks import DepthwiseConv1D


class TinyMHA(nn.Module):
    """Multi-head attention with separate q/k/v/out projections."""

    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, q, kv=None, *, mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        kv = q if kv is None else kv
        d = q.shape[-1]
        h = self.num_heads
        assert d % h == 0, f"d_model {d} not divisible by heads {h}"
        dh = d // h

        def split(x):
            return x.reshape(x.shape[:-1] + (h, dh))

        Q = split(nn.Dense(d, name="q_proj")(q))
        K = split(nn.Dense(d, name="k_proj")(kv))
        V = split(nn.Dense(d, name="v_proj")(kv))
        logits = jnp.einsum("...qhd,...khd->...hqk", Q, K) / np.sqrt(dh)
        if mask is not None:
            logits = jnp.where(mask, logits, -1e9)
        w = nn.softmax(logits, axis=-1)
        if self.dropout > 0:
            w = nn.Dropout(self.dropout, deterministic=not train)(w)
        out = jnp.einsum("...hqk,...khd->...qhd", w, V)
        out = out.reshape(out.shape[:-2] + (d,))
        return nn.Dense(d, name="out_proj")(out)


class LocalAttention(nn.Module):
    """Depthwise conv(s) over the sequence axis — local context mixing
    inside the reference's transformer layers. Two chained convs (k11,
    k5) is the HybridBinary form (`hybrid_binary.py:18-44`);
    ``kernel_size2=0`` gives the single-conv form of MSC_N (k5,
    `NN_models.py:151-167`) and ImprovedMSC (k9,
    `improved_model.py:18-33`)."""

    kernel_size: int = 11
    kernel_size2: int = 5

    @nn.compact
    def __call__(self, x):
        x = DepthwiseConv1D(self.kernel_size, name="local1")(x)
        if self.kernel_size2:
            x = DepthwiseConv1D(self.kernel_size2, name="local2")(x)
        return x


class RelativePositionEncoding(nn.Module):
    """Learned additive position embeddings, sliced to the sequence length."""

    max_len: int = 1200

    @nn.compact
    def __call__(self, x):
        n = x.shape[-2]
        enc = self.param("encoding", nn.initializers.normal(1.0),
                         (self.max_len, x.shape[-1]))
        return x + enc[:n]


class SinusoidalPositionEncoding(nn.Module):
    """Fixed sin/cos position encoding (transformer classic)."""

    max_len: int = 5000

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        pos = np.arange(self.max_len)[:, None]
        div = np.exp(np.arange(0, d, 2) * (-np.log(10000.0) / d))
        pe = np.zeros((self.max_len, d), np.float32)
        pe[:, 0::2] = np.sin(pos * div)
        pe[:, 1::2] = np.cos(pos * div)[:, : d // 2]
        return x + jnp.asarray(pe)[: x.shape[-2]]


class AttentionPool(nn.Module):
    """Softmax attention pooling over the sequence axis:
    weights = softmax(Dense_1(x)); used by SignalSequenceDetector
    (`model.py:313-317`) and temporal D-FINE v3."""

    @nn.compact
    def __call__(self, x):
        w = nn.softmax(nn.Dense(1)(x), axis=-2)
        return jnp.sum(x * w, axis=-2), w
