"""HybridBinary — the reference's best-validated per-signal defect detector.

Behavioural equivalent of
`signals/improved_multisignal/detection_models/hybrid_binary.py:83-168` and
its ONNX-friendly twin `hybrid_binary_dynamic.py:82-192` (which differs only
in using explicit-QKV attention — our TinyMHA is always explicit, so one
model covers both).

Forward (input ``(B, N, S)`` — N signals of length S per sequence):
1. per-signal conv stack 1->32->64->64 (k3/3/5) + pool to 128 samples,
   channel-mean -> per-signal 128-d descriptor
2. sequence-mean subtraction: concat[x, x - mean_over_N(x)] -> 256-d
3. shared MLP 256 -> 256 -> 128
4. learned relative position encoding (max_len 1200)
5. 4x hybrid transformer layers (MHA + LocalAttention k11∘k5 + FFN)
6. linear -> sigmoid -> per-signal defect probability (B, N)

TPU notes: the per-signal conv runs as one batched NWC conv over B*N
signals (MXU-tiled by XLA); everything is static-shaped.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from pautdx.nn.attention import RelativePositionEncoding
from pautdx.nn.blocks import ConvStack1D, adaptive_avg_pool1d
from pautdx.nn.transformer import Encoder


class HybridBinaryModel(nn.Module):
    hidden_sizes: Sequence[int] = (256, 128, 48)
    num_heads: int = 8
    dropout: float = 0.15
    num_transformer_layers: int = 4
    pooled_len: int = 128
    max_len: int = 1200
    norm: str = "batch"
    return_logits: bool = False

    @nn.compact
    def __call__(self, signals: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, N, S = signals.shape
        x = signals.reshape(B * N, S, 1)
        x = ConvStack1D((32, 64, 64), (3, 3, 5), norm=self.norm,
                        dropout=self.dropout, name="conv")(x, train)
        x = adaptive_avg_pool1d(x, self.pooled_len)     # (B*N, 128, 64)
        x = x.mean(axis=-1)                             # channel mean -> (B*N, 128)
        seq = x.reshape(B, N, self.pooled_len)
        seq_mean = seq.mean(axis=1, keepdims=True)
        seq = jnp.concatenate([seq, seq - seq_mean], axis=-1)   # (B, N, 256)

        h = nn.Dense(self.hidden_sizes[0], name="shared1")(seq)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_sizes[1], name="shared2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.relu(h)

        h = RelativePositionEncoding(self.max_len, name="pos_enc")(h)
        h = Encoder(self.num_transformer_layers, self.num_heads,
                    self.hidden_sizes[2], self.dropout, flavour="hybrid",
                    name="encoder")(h, train=train)
        logits = nn.Dense(1, name="classifier")(h)[..., 0]     # (B, N)
        return logits if self.return_logits else nn.sigmoid(logits)
