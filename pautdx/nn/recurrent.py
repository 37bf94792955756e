"""Recurrent context aggregators (flax.linen).

Equivalents of the reference's BiGRU/BiLSTM "context aggregator" heads
(`SignalSequenceDetection/model.py:179-192` BiGRU,
`enhanced_model.py:254-313` BiLSTM + learned-query attention). Sequences are
<= a few hundred steps, so ``nn.RNN`` (lax.scan under jit — static trip
count, TPU-fine) is the right tool; no Pallas needed here.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pautdx.nn.attention import TinyMHA


class BiGRU(nn.Module):
    """Bidirectional GRU; returns per-step features (concat of directions)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.GRUCell(self.hidden), name="fwd")(x)
        bwd = nn.RNN(nn.GRUCell(self.hidden), reverse=True,
                     keep_order=True, name="bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class BiLSTM(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="fwd")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                     keep_order=True, name="bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class ContextAggregator(nn.Module):
    """Stacked BiGRU + projection back to d_model; global sequence
    context. Reference (`model.py:160-192`): nn.GRU(hidden=d_model//2,
    num_layers=2, bidirectional) — per-direction hidden d/2 so the
    concat is d wide, stacked twice — then Linear(d, d)."""

    d_model: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.num_layers):
            h = BiGRU(self.d_model // 2, name=f"gru_{i}")(h)
        return nn.Dense(self.d_model, name="proj")(h)


class QueryAttentionAggregator(nn.Module):
    """BiLSTM + learned-query attention over the sequence
    (`enhanced_model.py:254-313`): a trainable query attends to the
    sequence; returns (per-step features, pooled context)."""

    d_model: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = BiLSTM(self.d_model)(x)
        h = nn.Dense(self.d_model, name="proj")(h)
        q = self.param("query", nn.initializers.normal(0.02),
                       (1, self.d_model))
        q = jnp.broadcast_to(q, x.shape[:-2] + (1, self.d_model))
        pooled = TinyMHA(self.num_heads, name="query_attn")(q, h, train=train)
        return h, pooled[..., 0, :]
