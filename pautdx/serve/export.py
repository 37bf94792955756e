"""Model export for external hosts — the ONNX-export path, TPU-native.

The reference ships models to a C# host via ``torch.onnx.export`` with
dynamic (batch, num_signals) axes (`signals/resaveModelOnnx.py:36-60`).
Here the portable artifact is a serialized **StableHLO** program via
``jax.export``: hermetic, versioned, loadable from any PJRT runtime (CPU/
TPU/GPU) without Python. Dynamic axes map to symbolic shapes when
supported, otherwise to the bucketed static shapes of
``pautdx.serve.endpoints``.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def export_forward(fn: Callable, example_args: Tuple,
                   path: Optional[str] = None,
                   polymorphic_batch: bool = False):
    """Serialize a jittable forward to StableHLO bytes (optionally saved).

    Returns the ``jax.export.Exported`` object; ``path`` gets the
    serialized bytes (``.stablehlo`` artifact).
    """
    from jax import export as jax_export

    if polymorphic_batch:
        (sym,) = jax_export.symbolic_shape("b")
        args = tuple(
            jax.ShapeDtypeStruct((sym,) + tuple(a.shape[1:]), a.dtype)
            for a in example_args)
    else:
        args = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                     for a in example_args)
    exported = jax_export.export(jax.jit(fn))(*args)
    if path is not None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(exported.serialize())
    return exported


def load_exported(path: str):
    """Deserialize and return a callable running the exported program."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call


def export_signal_model(model, variables, signal_shape: Tuple[int, int, int],
                        path: str, polymorphic_batch: bool = False):
    """Convenience: export ``model.apply`` on (B, N, S) signals."""
    def fwd(signals):
        return model.apply(variables, signals, train=False)

    example = (jnp.zeros(signal_shape, jnp.float32),)
    return export_forward(fwd, example, path, polymorphic_batch)
