"""TwoStageDefectDetector — binary classifier stage + position stage.

Equivalent of `SignalSequenceDetection/two_stage_model.py:8-501`:
- ``MultiScaleSignalEncoder``: 4 parallel kernel sizes 3/5/7/11, concatenated
  (`:38-122`).
- Stage 1 ``DefectClassifier`` with an uncertainty head (Softplus).
- Stage 2 ``DefectPositionPredictor`` with its own uncertainty; predicted
  positions are weighted by the defect probability (`:329-412`).

Outputs: ``{"prob", "positions", "cls_uncertainty", "pos_uncertainty"}``.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from pautdx.nn.blocks import MLP, MultiScaleConv1D
from pautdx.nn.transformer import Encoder


class TwoStageDetector(nn.Module):
    d_model: int = 128
    num_heads: int = 4
    num_layers: int = 2
    dropout: float = 0.1
    norm: str = "batch"

    @nn.compact
    def __call__(self, signals, train: bool = False) -> Dict[str, jnp.ndarray]:
        B, N, S = signals.shape
        x = signals.reshape(B * N, S, 1)
        x = MultiScaleConv1D(self.d_model // 4, (3, 5, 7, 11), norm=self.norm,
                             name="ms_encoder")(x, train)       # (B*N, S, d)
        x = x.mean(axis=-2)
        h = MLP((self.d_model,), name="proj")(x, train).reshape(B, N, self.d_model)
        h = Encoder(self.num_layers, self.num_heads, 4 * self.d_model,
                    self.dropout, name="context")(h, train=train)

        cls_logit = MLP((64, 1), dropout=self.dropout, name="classifier")(
            h, train)[..., 0]
        prob = nn.sigmoid(cls_logit)
        cls_unc = nn.softplus(MLP((64, 1), name="cls_uncertainty")(h, train)[..., 0])

        pos_in = jnp.concatenate([h, prob[..., None]], axis=-1)
        pos = nn.sigmoid(MLP((128, 64, 2), dropout=self.dropout,
                             name="position")(pos_in, train))
        pos_unc = nn.softplus(MLP((64, 2), name="pos_uncertainty")(h, train))
        # stage coupling: positions shrink to 0 for low-probability signals
        pos = pos * prob[..., None]
        return {"prob": prob, "positions": pos,
                "cls_uncertainty": cls_unc, "pos_uncertainty": pos_unc}
