"""Sequence windowing over per-beam scan axes.

The reference handles long beams by fixed-length windows at the data layer
(SURVEY.md §5.7). Two strategies exist:

- **chunked** (`json_dataset.py:84-99`, `D-Fine/temporal_dfine.py:59-67`):
  ``ceil(n/L)`` windows of length L; all but the last start at ``i*L``; the
  last is re-anchored to ``n - L`` (overlapping the previous one).
- **overlapping** (`SignalSequenceDetection/dataset_preparation.py:245-308`):
  sliding windows with a stride chosen to cover the whole beam.

Windows are returned as (start, end) index pairs so callers can slice
signals/labels/positions consistently.
"""

from __future__ import annotations

import math
from typing import List, Tuple


def chunked_windows(n: int, seq_len: int) -> List[Tuple[int, int]]:
    """Reference chunking with tail re-anchor; [] if n < seq_len."""
    if n < seq_len:
        return []
    out = []
    n_seqs = math.ceil(n / seq_len)
    for i in range(n_seqs):
        if i < n_seqs - 1:
            start = i * seq_len
        else:
            start = n - seq_len
        out.append((start, start + seq_len))
    return out


def overlapping_windows(n: int, seq_len: int) -> List[Tuple[int, int]]:
    """Evenly spaced overlapping windows covering [0, n); [] if n < seq_len.

    Stride is chosen so the first window starts at 0 and the last ends at n,
    matching the intent of `dataset_preparation.py:245-308`.
    """
    if n < seq_len:
        return []
    if n == seq_len:
        return [(0, seq_len)]
    n_windows = math.ceil((n - seq_len) / seq_len) + 1
    if n_windows == 1:
        return [(0, seq_len)]
    stride = (n - seq_len) / (n_windows - 1)
    return [
        (round(i * stride), round(i * stride) + seq_len) for i in range(n_windows)
    ]


def padded_window(n: int, seq_len: int) -> Tuple[int, int, int]:
    """For short beams: (start, end, pad) to zero-pad up to seq_len
    (`dataset_preparation.py:222-234` pads short windows with zeros)."""
    return (0, n, seq_len - n)
