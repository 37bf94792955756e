"""Serving: jit endpoints (bucketed shapes), stdin bridge, chunked runner."""

from pautdx.serve.bridge import serve_frames, serve_signals  # noqa: F401
from pautdx.serve.endpoints import (  # noqa: F401
    DetectorEndpoint, SignalEndpoint, chunked_sequence_runner,
)
