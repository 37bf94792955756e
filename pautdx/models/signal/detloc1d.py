"""Hybrid1D_DetLoc — anchor-free 1D detector with FPN + FiLM.

Equivalent of `signals/improved_multisignal/hybrid1111/hybrid1d_detloc.py:38-554`:
per-signal CSP-ish backbone with a /8 /16 /32 feature pyramid, a sequence
context transformer across the N signals, FiLM modulation of each pyramid
level by that context, and decoupled cls/(center, log-width) heads per cell.

Decoding (CenterNet-1D): Gaussian heatmap targets at defect centers, focal
BCE on heatmaps, masked SmoothL1 on (offset, log-width), plus a 1-IoU1D term
(losses live in ``pautdx.losses.heatmap``).

Output per scale s: ``{"cls": (B, N, Ls), "reg": (B, N, Ls, 2)}`` with
strides (8, 16, 32); ``decode()`` converts to per-signal (prob, start, end).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pautdx.nn.fpn1d import BackboneFPN1D, FiLM1D, Head1D, decode_1d
from pautdx.nn.transformer import Encoder

STRIDES = (8, 16, 32)


class Hybrid1DDetLoc(nn.Module):
    width: int = 64
    d_context: int = 128
    num_heads: int = 8
    num_context_layers: int = 2
    norm: str = "group"

    @nn.compact
    def __call__(self, signals, train: bool = False) -> List[Dict[str, jnp.ndarray]]:
        B, N, S = signals.shape
        x = signals.reshape(B * N, S, 1)
        p3, p4, p5 = BackboneFPN1D(self.width, self.norm, name="backbone")(
            x, train)

        # sequence context: pooled per-signal descriptor -> transformer over N
        desc = jnp.concatenate(
            [p.mean(axis=-2) for p in (p3, p4, p5)], axis=-1)
        ctx = nn.Dense(self.d_context, name="ctx_proj")(desc).reshape(
            B, N, self.d_context)
        ctx = Encoder(self.num_context_layers, self.num_heads,
                      4 * self.d_context, name="seq_context")(ctx, train=train)
        ctx_flat = ctx.reshape(B * N, self.d_context)

        outs = []
        for i, p in enumerate((p3, p4, p5)):
            p = FiLM1D(name=f"film_{i}")(p, ctx_flat)
            cls, reg = Head1D(self.width * 2, self.norm, name=f"head_{i}")(
                p, train)
            outs.append({
                "cls": cls.reshape(B, N, -1),
                "reg": reg.reshape(B, N, -1, 2),
            })
        return outs

    @staticmethod
    def decode(outs: List[Dict[str, jnp.ndarray]], signal_length: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Peak-pick across scales -> per-signal (prob, (start, end)).

        Equivalent of ``infer_single`` (`hybrid1d_detloc.py:245-265`): the
        best-scoring cell over all pyramid levels wins.
        """
        best_score, best_pos = None, None
        for out, stride in zip(outs, STRIDES):
            score, pos = decode_1d(out["cls"], out["reg"], stride,
                                   signal_length)
            idx = jnp.argmax(score, axis=-1)
            top = jnp.take_along_axis(score, idx[..., None], axis=-1)[..., 0]
            top_pos = jnp.take_along_axis(
                pos, idx[..., None, None], axis=-2)[..., 0, :]
            if best_score is None:
                best_score, best_pos = top, top_pos
            else:
                better = top > best_score
                best_score = jnp.where(better, top, best_score)
                best_pos = jnp.where(better[..., None], top_pos, best_pos)
        return best_score, best_pos
