"""Transformer encoder stacks (flax.linen).

Two flavours used throughout the reference:
- ``EncoderLayer``        — torch ``nn.TransformerEncoderLayer`` semantics
  (post-norm MHA + FFN), used by DefectDetectionModel, SignalSequenceDetector,
  TemporalDFine, SimpleDetectionModel, ...
- ``HybridEncoderLayer``  — MHA + LocalAttention + FFN with three post-norms
  (`hybrid_binary.py:47-80`), the HybridBinary/ImprovedMSC family.

Plus ``CrossShiftEncoderLayer`` — self-attention with cross-attention to the
right-shifted sequence (`signals/multisignalNN/NN_models.py:31-42`).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pautdx.nn.attention import LocalAttention, TinyMHA


class EncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (torch parity)."""

    num_heads: int
    ffn_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        drop = lambda y: nn.Dropout(self.dropout, deterministic=not train)(y)  # noqa: E731
        a = TinyMHA(self.num_heads, self.dropout, name="self_attn")(
            x, train=train)
        x = nn.LayerNorm(name="norm1")(x + drop(a))
        h = nn.Dense(self.ffn_dim)(x)
        h = nn.relu(h)
        h = drop(h)
        h = nn.Dense(x.shape[-1])(h)
        x = nn.LayerNorm(name="norm2")(x + drop(h))
        return x


class HybridEncoderLayer(nn.Module):
    """MHA + LocalAttention + FFN, each with residual + post-norm."""

    num_heads: int
    ffn_dim: int
    dropout: float = 0.15
    local_kernel: int = 11
    local_kernel2: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        drop = lambda y: nn.Dropout(self.dropout, deterministic=not train)(y)  # noqa: E731
        a = TinyMHA(self.num_heads, self.dropout, name="self_attn")(
            x, train=train)
        x = nn.LayerNorm(name="norm1")(x + drop(a))
        l = LocalAttention(self.local_kernel, self.local_kernel2,
                           name="local_attn")(x)
        x = nn.LayerNorm(name="norm2")(x + drop(l))
        h = nn.Dense(self.ffn_dim)(x)
        h = drop(h)
        h = nn.relu(h)
        h = nn.Dense(x.shape[-1])(h)
        h = drop(h)
        x = nn.LayerNorm(name="norm3")(x + h)
        return x


class CrossShiftEncoderLayer(nn.Module):
    """Self-attention plus cross-attention to the right-shifted sequence."""

    num_heads: int
    ffn_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        drop = lambda y: nn.Dropout(self.dropout, deterministic=not train)(y)  # noqa: E731
        a = TinyMHA(self.num_heads, self.dropout, name="self_attn")(
            x, train=train)
        x = nn.LayerNorm(name="norm1")(x + drop(a))
        shifted = jnp.roll(x, shift=1, axis=-2)
        c = TinyMHA(self.num_heads, self.dropout, name="cross_attn")(
            x, shifted, train=train)
        x = nn.LayerNorm(name="norm2")(x + drop(c))
        h = nn.Dense(self.ffn_dim)(x)
        h = nn.relu(h)
        h = nn.Dense(x.shape[-1])(h)
        x = nn.LayerNorm(name="norm3")(x + drop(h))
        return x


class Encoder(nn.Module):
    """A stack of encoder layers of the chosen flavour.

    ``local_kernels`` (hybrid flavour only): (k1, k2) for the layer's
    LocalAttention; k2=0 = single conv. Defaults to the HybridBinary
    (11, 5); MSC_N passes (5, 0) and ImprovedMSC (9, 0) per their
    references."""

    num_layers: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    flavour: str = "plain"   # plain | hybrid | cross_shift
    local_kernels: tuple = (11, 5)

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            if self.flavour == "hybrid":
                layer = HybridEncoderLayer(
                    self.num_heads, self.ffn_dim, self.dropout,
                    local_kernel=self.local_kernels[0],
                    local_kernel2=self.local_kernels[1],
                    name=f"layer_{i}")
            else:
                layer_cls = {"plain": EncoderLayer,
                             "cross_shift": CrossShiftEncoderLayer}[
                    self.flavour]
                layer = layer_cls(self.num_heads, self.ffn_dim,
                                  self.dropout, name=f"layer_{i}")
            x = layer(x, train=train)
        return x
