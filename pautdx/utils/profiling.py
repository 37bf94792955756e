"""Tracing / profiling hooks — a first-class subsystem (SURVEY.md §5.1:
the reference has only tqdm; here JAX profiler traces + per-step timing).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall timing with percentile summary + JSON artifact.

    Use ``with timer.step():`` around each training step; device work is
    fenced with ``block_until_ready`` only when ``sync`` is set (accurate
    but slower) — otherwise timings reflect dispatch + data-dependence.
    """

    def __init__(self, sync: bool = False):
        self.sync = sync
        self.times: List[float] = []

    @contextlib.contextmanager
    def step(self, result=None):
        t0 = time.perf_counter()
        yield
        if self.sync and result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - t0)

    def record(self, seconds: float) -> None:
        self.times.append(seconds)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        import numpy as np

        t = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            "steps": int(t.size),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p90_s": float(np.percentile(t, 90)),
            "p99_s": float(np.percentile(t, 99)),
            "total_s": float(np.asarray(self.times).sum()),
        }

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"summary": self.summary(), "times_s": self.times}, f)
