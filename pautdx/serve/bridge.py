"""stdin/stdout JSON bridge — process-boundary serving parity.

The reference's integration point with its external (C#) host: read a
``[T][H][W]`` float array from stdin, run the temporal detector, write
``[[{box, label, score}]]`` per frame to stdout
(`D-Fine/predict_sequence.py:7-53`). Same wire protocol here, backed by
the jit-compiled endpoint instead of torch-on-CPU.

Also serves the signal-domain models: ``{"signals": [[...]]}`` input ->
``{"prob": [...], "positions": [...]}``.
"""

from __future__ import annotations

import json
import sys
from typing import Callable, Optional


def serve_frames(predict_sequence: Callable, stdin=None, stdout=None) -> None:
    """One-shot frame-sequence bridge: [T][H][W] -> [[{box,label,score}]]."""
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    import numpy as np

    data = json.load(stdin)
    frames = np.asarray(data, np.float32)
    if frames.ndim == 3:                       # grayscale -> 3 channels
        frames = np.repeat(frames[..., None], 3, axis=-1)
    results = predict_sequence(frames)
    json.dump(results, stdout)
    stdout.flush()


def serve_signals(endpoint, stdin=None, stdout=None) -> None:
    """One-shot signal bridge: {"signals": [N][S]} -> per-signal outputs."""
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    import numpy as np

    data = json.load(stdin)
    signals = np.asarray(data["signals"], np.float32)
    out = endpoint.predict(signals[None] if signals.ndim == 2 else signals)
    payload = {k: v.tolist() for k, v in out.items()}
    json.dump(payload, stdout)
    stdout.flush()
