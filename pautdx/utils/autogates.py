"""Auto-gating: find the signal interval(s) containing structure echoes.

Re-design of the reference's auto-gates algorithm
(`signals/improved_multisignal/visualization/autogates_func.py:148-187`):
from a D-scan (scans x samples), compute per-sample row statistics, first
and second derivatives, and pick gate intervals as peak pairs where the
second derivative exceeds max/4. Used to crop the inspection gate before
per-signal classification.

Vectorized numpy; a jit JAX variant is provided for on-device gating
inside the input pipeline.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def row_statistics(dscan: np.ndarray) -> np.ndarray:
    """Mean |amplitude| per sample position over all scans: (S,)."""
    return np.abs(dscan).mean(axis=0)


def find_gates(dscan: np.ndarray, threshold_div: float = 4.0,
               min_width: int = 3) -> List[Tuple[int, int]]:
    """Gate intervals from second-derivative peak pairs."""
    stats = row_statistics(dscan)
    d1 = np.gradient(stats)
    d2 = np.gradient(d1)
    mag = np.abs(d2)
    thresh = mag.max() / threshold_div
    candidates = np.nonzero(mag >= thresh)[0]
    if candidates.size == 0:
        return [(0, stats.shape[0])]
    # group consecutive candidate indices into peaks
    groups = np.split(candidates, np.nonzero(np.diff(candidates) > 2)[0] + 1)
    peaks = [int(g.mean()) for g in groups]
    gates: List[Tuple[int, int]] = []
    for a, b in zip(peaks[:-1], peaks[1:]):
        if b - a >= min_width and stats[a:b].mean() > stats.mean():
            gates.append((a, b))
    if not gates:   # fall back to the span between the outermost peaks
        gates = [(peaks[0], max(peaks[-1], peaks[0] + min_width))]
    return gates


@jax.jit
def gate_mask(signals: jnp.ndarray, start: jnp.ndarray,
              end: jnp.ndarray) -> jnp.ndarray:
    """On-device gate crop: zero outside [start, end) per sample axis."""
    s = signals.shape[-1]
    idx = jnp.arange(s)
    mask = (idx >= start) & (idx < end)
    return signals * mask
