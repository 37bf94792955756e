"""Generation-1 MultiSignalClassifier family.

Behavioural equivalents of:
- ``MultiSignalClassifier``   — per-signal MLP + one MHA over the sequence +
  sigmoid head (`signals/GNN_training_multi_v2.py:12-38`).
- ``ConvMultiSignalClassifier`` (reference ``DefectDetectionModel``) — Conv1d
  1->64->128->128 + GAP + 4-layer transformer (d=128, 4 heads) + MLP sigmoid
  (`signals/MSC_Conv1D_training.py:50-89`).
- ``SetTransformer``          — Linear -> 2x attention blocks -> mean-pool ->
  sequence-level defect flag (`signals/GNN_training.py:34-65`).
- ``SignalClassifierMLP``     — plain per-signal MLP baseline
  (`signals/GNN_training_multipleout.py:42-54`).
- ``DenseAutoencoder``        — 64-32-16-32-64 AE for anomaly-by-
  reconstruction (`signals/train_AE.py:20-38`).

All take ``(B, N, S)`` and emit per-signal probabilities ``(B, N)`` unless
noted.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from pautdx.nn.attention import TinyMHA
from pautdx.nn.blocks import ConvStack1D, MLP
from pautdx.nn.transformer import Encoder


class MultiSignalClassifier(nn.Module):
    """Per-signal MLP -> MHA across signals -> per-signal sigmoid.

    Exact-parity forward with the reference checkpoint layout
    (`signals/MultiSignalClassifier_model*.pth`): shared MLP with ReLU after
    both layers, MHA(q=k=v) on the shared features, classifier applied to
    the *attention output* (no residual).
    """

    hidden: Sequence[int] = (128, 64, 32)
    num_heads: int = 4
    return_logits: bool = False

    @nn.compact
    def __call__(self, signals: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = MLP(self.hidden[:2], name="embed")(signals, train)
        h = nn.relu(h)
        a = TinyMHA(self.num_heads, name="attn")(h, train=train)
        logits = MLP((self.hidden[2], 1), name="head")(a, train)[..., 0]
        return logits if self.return_logits else nn.sigmoid(logits)


class ConvMultiSignalClassifier(nn.Module):
    """Conv1D feature extractor + transformer over the sequence."""

    d_model: int = 128
    num_heads: int = 4
    num_layers: int = 4
    dropout: float = 0.1
    norm: str = "batch"
    return_logits: bool = False

    @nn.compact
    def __call__(self, signals: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, N, S = signals.shape
        x = signals.reshape(B * N, S, 1)
        x = ConvStack1D((64, 128, self.d_model), (7, 5, 3), norm=self.norm,
                        name="conv")(x, train)
        x = x.mean(axis=-2)                       # GAP over samples
        x = x.reshape(B, N, self.d_model)
        x = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, name="encoder")(x, train=train)
        logits = MLP((64, 1), dropout=self.dropout, name="head")(x, train)[..., 0]
        return logits if self.return_logits else nn.sigmoid(logits)


class SetTransformer(nn.Module):
    """Sequence-level defect flag: returns (B,) probability."""

    d_model: int = 128
    num_heads: int = 4
    return_logits: bool = False

    @nn.compact
    def __call__(self, signals: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Dense(self.d_model, name="embed")(signals)
        for i in range(2):
            a = TinyMHA(self.num_heads, name=f"mab_{i}")(h, train=train)
            h = nn.LayerNorm(name=f"norm_{i}")(h + a)
        pooled = h.mean(axis=-2)
        logits = MLP((64, 1), name="head")(pooled, train)[..., 0]
        return logits if self.return_logits else nn.sigmoid(logits)


class SignalClassifierMLP(nn.Module):
    """Per-signal MLP baseline, no cross-signal context."""

    hidden: Sequence[int] = (128, 64)
    return_logits: bool = False

    @nn.compact
    def __call__(self, signals: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = MLP(tuple(self.hidden) + (1,), name="mlp")(signals, train)[..., 0]
        return h if self.return_logits else nn.sigmoid(h)


class DenseAutoencoder(nn.Module):
    """Dense AE trained on healthy signals; anomaly = reconstruction error.

    Mirrors the Keras 64-32-16-32-64 topology (`signals/train_AE.py:20-38`)
    but as JAX, reconstructing the full signal.
    """

    bottleneck: Sequence[int] = (64, 32, 16)

    @nn.compact
    def __call__(self, signals: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        S = signals.shape[-1]
        h = signals
        for f in self.bottleneck:
            h = nn.relu(nn.Dense(f)(h))
        for f in reversed(self.bottleneck[:-1]):
            h = nn.relu(nn.Dense(f)(h))
        return nn.Dense(S)(h)

    @staticmethod
    def anomaly_score(recon: jnp.ndarray, signals: jnp.ndarray) -> jnp.ndarray:
        return jnp.mean(jnp.square(recon - signals), axis=-1)
