"""Utilities: auto-gating, profiling, numerical-safety debug helpers."""

from pautdx.utils.autogates import find_gates, gate_mask, row_statistics  # noqa: F401
from pautdx.utils.debug import (  # noqa: F401
    check_finite, enable_nan_debugging, guarded, sanitize,
)
from pautdx.utils.profiling import StepTimer, trace  # noqa: F401
