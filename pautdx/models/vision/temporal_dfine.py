"""Temporal D-FINE — cross-frame fusion over B-scan sequences.

Re-designs of the reference's three variants (SURVEY.md §2.2):

- **v1** (`D-Fine/temporal_dfine.py:121-237`): frozen D-FINE trunk; a
  transformer encoder fuses each decoder query across the T frames of a
  sequence (attention along time, queries as batch); the FDR head
  (corner distributions -> integral -> distance2bbox) re-decodes boxes
  from the fused features.
- **v2** (`temp_dfine_over.py:126-285`): new defect-class classifier on
  top (num_labels = defects + 1), trunk still frozen.
- **v3** (`temp_dfine_over_improved.py:126-353`): adds a temporal
  attention pool (softmax over T), a BiGRU context aggregator with
  projector, and an anomaly MLP whose scores are added to the defect
  logits; anomaly temporal-consistency MSE joins the loss (weight 0.1).

Input is one sequence of T frames ``(T, H, W, 3)``; the trunk treats T as
its batch. Freezing is an optimizer concern (zero-lr masks on the
``trunk`` param subtree — ``pautdx.train.optim``), plus
``stop_trunk_gradient`` to cut the graph like the reference's frozen
backbone.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pautdx.models.vision.dfine import (
    DFine, DFineConfig, distance2bbox, integral, weighting_function,
)
from pautdx.nn.recurrent import BiGRU
from pautdx.nn.transformer import Encoder


class TemporalDFine(nn.Module):
    cfg: DFineConfig = DFineConfig()
    variant: str = "v1"                  # v1 | v2 | v3
    num_temporal_layers: int = 4
    temporal_heads: int = 8
    stop_trunk_gradient: bool = True

    @nn.compact
    def __call__(self, frames: jnp.ndarray, train: bool = False
                 ) -> Dict[str, Any]:
        c = self.cfg
        trunk_out = DFine(c, name="trunk")(frames, train=False)
        hidden = trunk_out["last_hidden_state"]        # (T, Q, D)
        init_refs = trunk_out["initial_references"][-1]
        if self.stop_trunk_gradient:
            hidden = jax.lax.stop_gradient(hidden)
            init_refs = jax.lax.stop_gradient(init_refs)

        T, Q, D = hidden.shape
        # fuse across time: queries become the batch axis
        seq = jnp.swapaxes(hidden, 0, 1)               # (Q, T, D)
        fused = Encoder(self.num_temporal_layers, self.temporal_heads,
                        4 * D, dropout=0.1, name="temporal_encoder")(
            seq, train=train)
        fused = jnp.swapaxes(fused, 0, 1)              # (T, Q, D)

        if self.variant == "v3":
            # temporal attention over frames per query
            attn = nn.softmax(
                nn.Dense(1, name="temporal_attention")(
                    jnp.swapaxes(fused, 0, 1)), axis=-2)  # (Q, T, 1)
            context = BiGRU(D, name="context_aggregator")(
                jnp.swapaxes(fused, 0, 1))               # (Q, T, 2D)
            context = nn.Dense(D, name="context_projector")(context)
            fused = fused + jnp.swapaxes(attn * context, 0, 1)

        feats = hidden + fused                          # residual fusion

        scores = nn.Dense(c.num_labels, name="class_head")(feats)
        corners = nn.Dense(4 * (c.max_num_bins + 1), name="bbox_head")(feats)
        project = weighting_function(c.max_num_bins, c.up, c.reg_scale)
        boxes = distance2bbox(init_refs,
                              integral(corners, project, c.max_num_bins),
                              c.reg_scale)
        boxes = jnp.clip(jnp.nan_to_num(boxes, nan=0.0), 0.0, 1.0)

        out: Dict[str, Any] = {
            "logits": jnp.clip(scores, -20.0, 20.0),    # reference clamp
            "pred_boxes": boxes,
            "trunk_logits": trunk_out["logits"],
            "trunk_boxes": trunk_out["pred_boxes"],
        }
        if self.variant == "v3":
            anomaly = nn.sigmoid(
                nn.Dense(1, name="anomaly_detector")(
                    nn.relu(nn.Dense(D, name="anomaly_hidden")(feats))))
            anomaly = anomaly[..., 0]
            out["anomaly"] = anomaly
            out["logits"] = out["logits"].at[..., 1:].add(anomaly[..., None])
        return out


def temporal_consistency_loss(anomaly: jnp.ndarray) -> jnp.ndarray:
    """MSE between consecutive frames' anomaly maps (weight 0.1 in v3)."""
    return jnp.mean(jnp.square(anomaly[1:] - anomaly[:-1]))
