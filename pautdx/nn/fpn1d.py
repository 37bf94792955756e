"""1D CSP backbone + FPN + FiLM modulation + decoupled det/loc heads.

Equivalent of the reference's anchor-free 1D detector internals
(`signals/improved_multisignal/hybrid1111/hybrid1d_detloc.py:98-190`):
- ``BackboneFPN1D``: conv backbone with /8 /16 /32 strides + lateral FPN.
- ``FiLM1D``: feature-wise linear modulation of pyramid levels by a
  sequence-context vector (`:160-170`).
- ``Head1D``: decoupled classification and (center-offset, log-width)
  regression per pyramid cell (`:177-190`).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pautdx.nn.blocks import ConvBlock1D


class BackboneFPN1D(nn.Module):
    """Strided conv backbone producing P3 (/8), P4 (/16), P5 (/32) features."""

    width: int = 64
    norm: str = "group"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.width
        x = ConvBlock1D(c, 7, stride=2, norm=self.norm)(x, train)      # /2
        x = ConvBlock1D(c, 3, stride=2, norm=self.norm)(x, train)      # /4
        c3 = ConvBlock1D(c * 2, 3, stride=2, norm=self.norm)(x, train)     # /8
        c4 = ConvBlock1D(c * 4, 3, stride=2, norm=self.norm)(c3, train)    # /16
        c5 = ConvBlock1D(c * 8, 3, stride=2, norm=self.norm)(c4, train)    # /32
        # lateral 1x1 + top-down sum
        p5 = nn.Conv(c * 2, (1,), name="lat5")(c5)
        p4 = nn.Conv(c * 2, (1,), name="lat4")(c4) + _upsample2(p5, c4.shape[-2])
        p3 = nn.Conv(c * 2, (1,), name="lat3")(c3) + _upsample2(p4, c3.shape[-2])
        smooth = lambda p, n: nn.Conv(c * 2, (3,), padding="SAME", name=n)(p)  # noqa: E731
        return smooth(p3, "out3"), smooth(p4, "out4"), smooth(p5, "out5")


def _upsample2(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Nearest-neighbour upsample along the length axis to ``out_len``."""
    up = jnp.repeat(x, 2, axis=-2)
    return up[..., :out_len, :]


class FiLM1D(nn.Module):
    """gamma/beta modulation of features by a context vector."""

    @nn.compact
    def __call__(self, feat, context):
        c = feat.shape[-1]
        gb = nn.Dense(2 * c)(context)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return feat * (1.0 + gamma[..., None, :]) + beta[..., None, :]


class Head1D(nn.Module):
    """Decoupled heads: cls logit + (center offset in cell, log width)."""

    width: int = 128
    norm: str = "group"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h_cls = ConvBlock1D(self.width, 3, norm=self.norm, name="cls_conv")(
            x, train)
        cls = nn.Conv(1, (1,), name="cls_out")(h_cls)[..., 0]
        h_reg = ConvBlock1D(self.width, 3, norm=self.norm, name="reg_conv")(
            x, train)
        reg = nn.Conv(2, (1,), name="reg_out")(h_reg)   # (offset, log_w)
        return cls, reg


def decode_1d(cls_logits: jnp.ndarray, reg: jnp.ndarray, stride: int,
              signal_length: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cell predictions -> (score, (start, end) normalized).

    center = (cell + 0.5 + offset) * stride; width = exp(log_w) * stride
    (the reference decodes the same way in ``infer_single``,
    `hybrid1d_detloc.py:245-265`).
    """
    n_cells = cls_logits.shape[-1]
    cells = jnp.arange(n_cells, dtype=jnp.float32)
    center = (cells + 0.5 + jnp.tanh(reg[..., 0])) * stride
    width = jnp.exp(jnp.clip(reg[..., 1], -4.0, 4.0)) * stride
    start = jnp.clip((center - width / 2) / signal_length, 0.0, 1.0)
    end = jnp.clip((center + width / 2) / signal_length, 0.0, 1.0)
    return nn.sigmoid(cls_logits), jnp.stack([start, end], axis=-1)
