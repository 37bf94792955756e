"""EnhancedPosition MSC + HybridModel (detection path + position path).

Equivalents of:
- ``EnhancedPositionMSC`` — dual-scale background removal (k15 + k31),
  separate detection head and a deep fine-position head over
  ``[shared ⊕ transformer ⊕ detection_prob]`` plus a coarse head, blended
  0.7/0.3, with min/max swap and a 0.01 minimum-gap constraint
  (`signals/improved_multisignal/enhanced_position_model.py:68-279`).
- ``FixedEnhancedPositionMSC`` — fully separate detection and position
  transformer stacks (`fixed_enhanced_position_model.py:106-130`).
- ``HybridModel`` — proven ImprovedMSC detection path + a position module
  conditioned on detection confidence (`hybrid_model.py:61-208`); the
  reference's freeze/unfreeze API maps to optimizer param-group masks in
  ``pautdx.train.optim`` (3-phase schedule of `train_hybrid.py:93-106`).

Output dict: ``{"prob", "positions"}`` (+ ``"coarse_positions"`` where
applicable).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from pautdx.models.signal.msc_n import ImprovedMSC, _ConvDescriptor
from pautdx.nn.attention import RelativePositionEncoding
from pautdx.nn.blocks import MLP
from pautdx.nn.transformer import Encoder


def _constrain_positions(pos: jnp.ndarray, min_gap: float = 0.01) -> jnp.ndarray:
    """Sigmoid -> sort (start, end) -> enforce a minimum gap."""
    pos = nn.sigmoid(pos)
    start = jnp.minimum(pos[..., 0], pos[..., 1])
    end = jnp.maximum(pos[..., 0], pos[..., 1])
    end = jnp.maximum(end, start + min_gap)
    return jnp.stack([start, jnp.clip(end, 0.0, 1.0)], axis=-1)


class EnhancedPositionMSC(nn.Module):
    d_model: int = 128
    num_heads: int = 8
    num_layers: int = 4
    dropout: float = 0.15
    max_len: int = 300
    norm: str = "batch"
    fine_weight: float = 0.7

    @nn.compact
    def __call__(self, signals, train: bool = False) -> Dict[str, jnp.ndarray]:
        # chained dual-scale bg (k15 -> BN -> k31) on the CONV features
        # (`enhanced_position_model.py:87-91`); k9 local attention
        shared = _ConvDescriptor((16, 32), (3, 3), self.d_model, self.norm,
                                 bg_kernels=(15, 31), bg_chained=True,
                                 dropout=self.dropout,
                                 name="descriptor")(signals, train)
        h = RelativePositionEncoding(self.max_len, name="pos_enc")(shared)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, flavour="hybrid", local_kernels=(9, 0),
                    name="encoder")(h, train=train)

        det_logit = MLP((64, 1), dropout=self.dropout, name="detection_head")(
            h, train)[..., 0]
        prob = nn.sigmoid(det_logit)

        fine_in = jnp.concatenate([shared, h, prob[..., None]], axis=-1)
        fine = MLP((256, 128, 64, 2), dropout=self.dropout,
                   name="fine_position_head")(fine_in, train)
        coarse = MLP((64, 2), dropout=self.dropout,
                     name="coarse_position_head")(h, train)
        pos = _constrain_positions(
            self.fine_weight * fine + (1 - self.fine_weight) * coarse)
        return {"prob": prob, "positions": pos,
                "coarse_positions": _constrain_positions(coarse)}


class FixedEnhancedPositionMSC(nn.Module):
    """Separate transformer stacks for detection and position."""

    d_model: int = 128
    num_heads: int = 8
    num_layers: int = 4
    dropout: float = 0.15
    max_len: int = 300
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False) -> Dict[str, jnp.ndarray]:
        shared = _ConvDescriptor((16, 32), (3, 3), self.d_model, self.norm,
                                 bg_kernels=(15, 31), bg_chained=True,
                                 dropout=self.dropout,
                                 name="descriptor")(signals, train)
        shared = RelativePositionEncoding(self.max_len, name="pos_enc")(shared)
        h_det = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                        self.dropout, flavour="hybrid", local_kernels=(9, 0),
                        name="det_encoder")(shared, train=train)
        h_pos = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                        self.dropout, flavour="hybrid", local_kernels=(9, 0),
                        name="pos_encoder")(shared, train=train)
        det_logit = MLP((64, 1), dropout=self.dropout, name="detection_head")(
            h_det, train)[..., 0]
        pos = MLP((128, 64, 2), dropout=self.dropout, name="position_head")(
            h_pos, train)
        return {"prob": nn.sigmoid(det_logit),
                "positions": _constrain_positions(pos)}


class HybridModel(nn.Module):
    """Detection path (ImprovedMSC) + confidence-conditioned position module.

    Param groups ``detection`` vs ``position`` support the reference's
    3-phase freeze schedule via optimizer masks.
    """

    d_model: int = 128
    num_heads: int = 8
    dropout: float = 0.15
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False) -> Dict[str, jnp.ndarray]:
        det = ImprovedMSC(d_model=self.d_model, num_heads=self.num_heads,
                          dropout=self.dropout, norm=self.norm,
                          name="detection")(signals, train=train)
        prob = det["prob"]
        desc = _ConvDescriptor((16, 32), (3, 3), self.d_model, self.norm,
                               name="position_descriptor")(signals, train)
        cond = jnp.concatenate([desc, prob[..., None]], axis=-1)
        pos_raw = MLP((256, 128, 2), dropout=self.dropout,
                      name="position_head")(cond, train)
        pos = _constrain_positions(pos_raw)
        # low-confidence signals keep the detection path's positions
        pos = jnp.where(prob[..., None] > 0.5, pos, det["positions"])
        return {"prob": prob, "positions": pos}
