"""Device mesh + sharding rules.

The reference is single-GPU (SURVEY.md §2.9/§5.8); data parallelism over an
ICI mesh is a new first-class layer here. Default topology: 1-axis ``dp``
mesh over all local devices; batches are sharded on their leading axis,
parameters are replicated, and gradient psums come free from XLA when the
jitted step runs under these shardings.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp",),
              devices: Optional[Sequence] = None) -> Mesh:
    """1D (or reshaped 2D) mesh over the first ``n_devices`` devices.

    With two axis names the device array is the BALANCED split
    ``(n // minor, minor)`` where ``minor`` is the largest divisor of n
    that is <= sqrt(n) — e.g. 8 devices as ('dp', 'tp') give a (4, 2)
    mesh with REAL tensor-parallel sharding on the second axis, not a
    trivial (n, 1). Callers that want a specific topology should pass
    ``devices`` pre-reshaped or build the ``Mesh`` directly
    (``pautdx.mesh.tp.mesh_2d`` covers explicit (dp, tp) shapes).
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    if len(axis_names) == 1:
        arr = np.asarray(devs)
    elif len(axis_names) == 2:
        # balanced split: largest divisor of n that is <= sqrt(n) goes to
        # the SECOND axis (tp-style minor axis rides the faster links)
        n = len(devs)
        minor = max((d for d in range(1, int(n ** 0.5) + 1) if n % d == 0))
        arr = np.asarray(devs).reshape(n // minor, minor)
    else:
        # >2 axes has no sensible default split — make the caller choose
        # (pautdx.mesh.tp.mesh_2d covers the (dp, tp) case)
        raise ValueError(
            f"make_mesh cannot auto-shape {len(axis_names)} axes; pass "
            f"`devices` pre-reshaped or build the Mesh directly")
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis across ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place a pytree of host arrays with leading-axis sharding."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
