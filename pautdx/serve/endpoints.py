"""jit-compiled inference endpoints — the ONNX-export replacement.

The reference deploys by exporting ONNX with dynamic (batch, num_signals)
axes for a C# host (`signals/resaveModelOnnx.py:36-60`). The TPU-native
path is an AOT-jitted endpoint per bucketed shape: dynamic axes become a
small set of padded static buckets (powers of two), each compiled once and
cached — same flexibility, no ONNX runtime.
"""

from __future__ import annotations

import bisect
import logging
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


_log = logging.getLogger("pautdx.serve")

_OVERFLOW_FACTOR = 8


def _bucket(n: int, buckets: Sequence[int]) -> int:
    i = bisect.bisect_left(buckets, n)
    if i == len(buckets):
        # overflow: auto-extend by doubling the largest configured
        # bucket until it fits (a power of two only if the largest bucket
        # is one) — the ONNX dynamic-axes contract this replaces accepts
        # any size, so a larger-than-configured request compiles one more
        # bucket instead of failing. BOUNDED at 8x the largest configured
        # bucket: the axis is request-controlled, and an unbounded double
        # would let one oversized request force an enormous pad + compile
        # (host/device OOM) — beyond the cap, fail loudly like the
        # pre-overflow contract did
        b = buckets[-1]
        while b < n:
            b *= 2
        if b > buckets[-1] * _OVERFLOW_FACTOR:
            raise ValueError(
                f"request size {n} exceeds the overflow cap "
                f"({buckets[-1]} * {_OVERFLOW_FACTOR}); raise the "
                f"configured buckets for workloads of this size")
        return b
    return buckets[i]


class SignalEndpoint:
    """Per-signal detector endpoint with (batch, num_signals) bucketing.

    ``predict(signals)`` accepts any (B, N, S) numpy array; B and N are
    padded up to the nearest bucket, the jitted forward runs, and padding
    is stripped from the result. Mirrors the ONNX dynamic-axes contract.
    """

    def __init__(self, model, variables, *,
                 batch_buckets: Sequence[int] = (1, 2, 4, 8, 16),
                 signal_buckets: Sequence[int] = (8, 16, 32, 50, 64, 128),
                 threshold: float = 0.5):
        self.model = model
        self.variables = variables
        self.batch_buckets = sorted(batch_buckets)
        self.signal_buckets = sorted(signal_buckets)
        self.threshold = threshold
        self._compiled: Dict = {}
        # overflow observability (operators should notice misconfigured
        # buckets): new-bucket compiles are warned once each and counted;
        # the extended bucket is memoized into signal_buckets so repeat
        # oversized requests take the bisect fast path. The overflow cap
        # stays anchored at the CONFIGURED maximum.
        self._configured_max_signals = self.signal_buckets[-1]
        self.overflow_buckets_compiled = 0

    def _signal_bucket(self, n: int) -> int:
        i = bisect.bisect_left(self.signal_buckets, n)
        if i < len(self.signal_buckets):
            return self.signal_buckets[i]
        cap_base = self._configured_max_signals
        b = cap_base
        while b < n:
            b *= 2
        if b > cap_base * _OVERFLOW_FACTOR:
            raise ValueError(
                f"request size {n} exceeds the overflow cap "
                f"({cap_base} * {_OVERFLOW_FACTOR}); raise the "
                f"configured buckets for workloads of this size")
        self.overflow_buckets_compiled += 1
        _log.warning(
            "SignalEndpoint num_signals overflow: request %d > largest "
            "configured bucket %d — compiling new %d-bucket on the "
            "serving path (%d overflow compiles so far); raise "
            "signal_buckets if this workload is routine",
            n, cap_base, b, self.overflow_buckets_compiled)
        bisect.insort(self.signal_buckets, b)   # memoize: repeats bisect-hit
        return b

    def _forward(self):
        model, variables = self.model, self.variables

        @jax.jit
        def fwd(signals):
            return model.apply(variables, signals, train=False)

        return fwd

    def predict(self, signals: np.ndarray) -> Dict[str, np.ndarray]:
        signals = np.asarray(signals, np.float32)
        if signals.ndim == 2:
            signals = signals[None]
        B, N, S = signals.shape
        max_b = self.batch_buckets[-1]
        if B > max_b:
            # batch overflow: chunk over the largest compiled bucket rather
            # than compiling an unboundedly large program
            parts = [self.predict(signals[i:i + max_b])
                     for i in range(0, B, max_b)]
            return {k: np.concatenate([p[k] for p in parts])
                    for k in parts[0]}
        Bp = _bucket(B, self.batch_buckets)
        Np = self._signal_bucket(N)
        padded = np.zeros((Bp, Np, S), np.float32)
        padded[:B, :N] = signals
        if "fwd" not in self._compiled:
            self._compiled["fwd"] = self._forward()
        out = self._compiled["fwd"](jnp.asarray(padded))
        if isinstance(out, dict):
            prob = np.asarray(out["prob"])[:B, :N]
            result = {"prob": prob,
                      "pred": (prob >= self.threshold).astype(np.float32)}
            if "positions" in out:
                result["positions"] = np.asarray(out["positions"])[:B, :N]
            return result
        prob = np.asarray(out)[:B, :N]
        return {"prob": prob,
                "pred": (prob >= self.threshold).astype(np.float32)}


class DetectorEndpoint:
    """B-scan image detector endpoint (D-FINE or YOLO) with NMS/top-k."""

    def __init__(self, forward: Callable, *, threshold: float = 0.3):
        self.forward = jax.jit(forward)
        self.threshold = threshold

    def predict(self, images: np.ndarray) -> list:
        """images (T, H, W, 3) -> per-frame [{box, label, score}, ...]
        (the reference bridge's output schema, `predict_sequence.py:7-53`).
        uint8 frames (the PNG-pipeline wire format) are rescaled to
        [0, 1] to match the training-time contract."""
        images = np.asarray(images)
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0
        out = self.forward(jnp.asarray(images, jnp.float32))
        scores = np.asarray(out["scores"])
        classes = np.asarray(out["classes"])
        boxes = np.asarray(out["boxes"])
        valid = np.asarray(out["valid"]) & (scores >= self.threshold)
        results = []
        for t in range(scores.shape[0]):
            frame = []
            for i in np.nonzero(valid[t])[0]:
                frame.append({
                    "box": [float(v) for v in boxes[t, i]],
                    "label": int(classes[t, i]),
                    "score": float(scores[t, i]),
                })
            results.append(frame)
        return results


def chunked_sequence_runner(predict_fn: Callable, frames: np.ndarray,
                            seq_len: int = 50) -> list:
    """Run a temporal model over arbitrarily long frame stacks in chunks of
    ``seq_len`` with a re-anchored tail (`eval_temp_dfine.py:27-122`,
    `temporal_dfine.py:59-67` chunking semantics); merges per-frame results
    so every original frame gets exactly one prediction."""
    from pautdx.data.windowing import chunked_windows, padded_window

    T = frames.shape[0]
    results: list = [None] * T
    if T < seq_len:
        a, b, pad = padded_window(T, seq_len)
        padded = np.concatenate(
            [frames, np.zeros((pad,) + frames.shape[1:], frames.dtype)])
        out = predict_fn(padded)
        for i in range(T):
            results[i] = out[i]
        return results
    for (a, b) in chunked_windows(T, seq_len):
        out = predict_fn(frames[a:b])
        for i in range(a, b):
            if results[i] is None:
                results[i] = out[i - a]
    return results
