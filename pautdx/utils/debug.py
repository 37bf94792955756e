"""Numerical-safety subsystem: debug-mode NaN checks + sanitizers.

The reference sanitizes pervasively (nan_to_num + logit clamps +/-20, bbox
clamps, try/except CE fallbacks — SURVEY.md §5.2). Here that becomes:
- :func:`enable_nan_debugging` — global ``jax_debug_nans``
- :func:`sanitize` — nan_to_num + clamp as one jit-safe call
- :func:`check_finite` — assert-finite on a pytree (host-side, eager)
- :func:`guarded` — wrap an objective so non-finite losses fall back to a
  surrogate (the reference's CE-to-no-object fallback generalized).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def sanitize(x: jnp.ndarray, clamp: Optional[float] = 20.0) -> jnp.ndarray:
    x = jnp.nan_to_num(x, nan=0.0, posinf=clamp or 1e4, neginf=-(clamp or 1e4))
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x


def check_finite(tree, name: str = "tree") -> None:
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad.append("/".join(str(getattr(k, "key", k)) for k in path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")


def guarded(objective: Callable, fallback_value: float = 1.0) -> Callable:
    """Replace a non-finite loss with a constant surrogate (gradient-free)
    so a single bad batch cannot poison training — jit-safe analogue of the
    reference's per-frame try/except fallback."""

    def wrapped(*args, **kwargs):
        loss, aux = objective(*args, **kwargs)
        ok = jnp.isfinite(loss)
        safe = jnp.where(ok, loss, fallback_value)
        aux = dict(aux)
        aux["loss_was_finite"] = ok.astype(jnp.float32)
        return safe, aux

    return wrapped
