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
    """1D (or reshaped N-D) mesh over the first ``n_devices`` devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    if len(axis_names) == 1:
        arr = np.asarray(devs)
    else:
        # split devices evenly across leading axes; last axis gets the rest
        n = len(devs)
        shape = [1] * len(axis_names)
        shape[0] = n
        arr = np.asarray(devs).reshape(shape)
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
