"""MSC conv 3-output models (gen 1.5) and the ImprovedMSC (gen 2).

Equivalents of:
- ``MSC3Out``      — conv 1->8->16 + channel-mean + MLP + RelPosEnc +
  cross-shift transformer -> 3 outputs: sigmoid prob, (start, end) via
  0.5*tanh+0.5 (`signals/multisignalNN/NN_models.py:45-128`).
- ``MSC_N``        — same but LocalAttention (single depthwise k5)
  instead of cross-attention, a background extractor (depthwise k11)
  subtracted from the CONV FEATURES over the sample axis, and no conv
  BatchNorm (`NN_models.py:140-246`).
- ``ImprovedMSC``  — MSC_N scaled up: conv 1->16->32, bg k15, local k9,
  4 hybrid transformer layers, positions clamped not squashed
  (`signals/improved_multisignal/improved_model.py:69-193`).

Output dict: ``{"prob": (B, N), "positions": (B, N, 2)}``.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from pautdx.nn.attention import RelativePositionEncoding
from pautdx.nn.blocks import BackgroundExtractor, ConvStack1D, MLP
from pautdx.nn.transformer import Encoder


class _ConvDescriptor(nn.Module):
    """Per-signal conv stack (+ optional background subtraction on the
    CONV FEATURES, over the sample axis) + channel mean + shared MLP
    (trailing ReLU, reference shared_layer) -> d_model descriptor."""

    conv_features: Sequence[int]
    conv_kernels: Sequence[int]
    d_model: int
    norm: str = "batch"
    # depthwise bg estimate subtracted from the (B*N, S, C) conv
    # features BEFORE the channel mean (`NN_models.py:229-233`);
    # bg_chained: sequential kernels with a norm between
    # (EnhancedPosition k15 -> BN -> k31)
    bg_kernels: Sequence[int] = ()
    bg_chained: bool = False
    dropout: float = 0.0      # ImprovedMSC shared_layer dropout

    @nn.compact
    def __call__(self, signals, train: bool = False):
        B, N, S = signals.shape
        x = signals.reshape(B * N, S, 1)
        x = ConvStack1D(self.conv_features, self.conv_kernels,
                        norm=self.norm,
                        dropout=self.dropout, name="conv")(x, train)
        if self.bg_kernels:
            x = BackgroundExtractor(tuple(self.bg_kernels),
                                    chained=self.bg_chained,
                                    name="bg")(x, train)
        x = x.mean(axis=-1)                       # mean over channels -> (B*N, S)
        # reference shared_layer ends Linear -> ReLU: descriptors are
        # non-negative
        x = MLP((2 * self.d_model, self.d_model), dropout=self.dropout,
                final_act=nn.relu, name="proj")(x, train)
        return x.reshape(B, N, self.d_model)


class MSC3Out(nn.Module):
    """3-output MSC with cross-shift attention transformer."""

    d_model: int = 128
    num_heads: int = 4
    num_layers: int = 2
    dropout: float = 0.1
    max_len: int = 300
    # reference MSC conv1d has no BatchNorm (`NN_models.py:45-60`)
    norm: str = "none"

    @nn.compact
    def __call__(self, signals, train: bool = False) -> Dict[str, jnp.ndarray]:
        h = _ConvDescriptor((8, 16), (3, 3), self.d_model, self.norm,
                            name="descriptor")(signals, train)
        h = RelativePositionEncoding(self.max_len, name="pos_enc")(h)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, flavour="cross_shift", name="encoder")(
            h, train=train)
        out = nn.Dense(3, name="head")(h)
        prob = nn.sigmoid(out[..., 0])
        pos = 0.5 * jnp.tanh(out[..., 1:3]) + 0.5
        return {"prob": prob, "positions": pos}


class MSC_N(nn.Module):
    """LocalAttention variant with background subtraction."""

    d_model: int = 128
    num_heads: int = 4
    num_layers: int = 2
    dropout: float = 0.1
    max_len: int = 300
    bg_kernel: int = 11
    # reference MSC_N conv1d has NO BatchNorm (`NN_models.py:202-207`)
    norm: str = "none"

    @nn.compact
    def __call__(self, signals, train: bool = False) -> Dict[str, jnp.ndarray]:
        # bg subtraction happens on the conv FEATURES over the sample
        # axis (`NN_models.py:229-233`), not on the post-MLP descriptor
        h = _ConvDescriptor((8, 16), (3, 3), self.d_model, self.norm,
                            bg_kernels=(self.bg_kernel,),
                            name="descriptor")(signals, train)
        h = RelativePositionEncoding(self.max_len, name="pos_enc")(h)
        # single depthwise k5 local attention (`NN_models.py:151-167`)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, flavour="hybrid", local_kernels=(5, 0),
                    name="encoder")(h, train=train)
        out = nn.Dense(3, name="head")(h)
        prob = nn.sigmoid(out[..., 0])
        pos = 0.5 * jnp.tanh(out[..., 1:3]) + 0.5
        return {"prob": prob, "positions": pos}


class ImprovedMSC(nn.Module):
    """Scaled-up MSC_N; the 'proven 97% detection path' of HybridModel
    (`hybrid_model.py:63`)."""

    d_model: int = 128
    num_heads: int = 8
    num_layers: int = 4
    dropout: float = 0.15
    max_len: int = 300
    bg_kernel: int = 15
    # ImprovedMSC's conv1d DOES BatchNorm (`improved_model.py:74-82`)
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False) -> Dict[str, jnp.ndarray]:
        h = _ConvDescriptor((16, 32), (3, 3), self.d_model, self.norm,
                            bg_kernels=(self.bg_kernel,),
                            dropout=self.dropout,
                            name="descriptor")(signals, train)
        h = RelativePositionEncoding(self.max_len, name="pos_enc")(h)
        # single depthwise k9 local attention (`improved_model.py:18-33`)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, flavour="hybrid", local_kernels=(9, 0),
                    name="encoder")(h, train=train)
        out = nn.Dense(3, name="head")(h)
        prob = nn.sigmoid(out[..., 0])
        pos = jnp.clip(out[..., 1:3], 0.0, 1.0)   # clamp, not squash
        return {"prob": prob, "positions": pos}
