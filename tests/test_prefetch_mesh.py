import numpy as np

import jax
import jax.numpy as jnp

from pautdx.data.prefetch import (
    ThreadedHostLoader, device_prefetch, prefetch_to_device,
)
from pautdx.mesh import batch_sharding, make_mesh, replicated, shard_batch


def _batches(n):
    for i in range(n):
        yield {"x": np.full((8, 4), i, np.float32)}


def test_device_prefetch_preserves_order_and_count():
    out = list(device_prefetch(_batches(5), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        assert float(b["x"][0, 0]) == i


def test_threaded_host_loader_reiterable():
    loader = ThreadedHostLoader(list(_batches(4)), capacity=2)
    assert len(list(loader)) == 4
    assert len(list(loader)) == 4  # second epoch works


def test_threaded_host_loader_propagates_errors():
    def bad():
        yield {"x": np.zeros(1)}
        raise RuntimeError("boom")

    import pytest
    with pytest.raises(RuntimeError, match="boom"):
        list(ThreadedHostLoader(bad()))


def test_prefetch_to_device_with_sharding():
    mesh = make_mesh(8)
    sh = batch_sharding(mesh)
    out = list(prefetch_to_device(_batches(3), size=2, sharding=sh))
    assert len(out) == 3
    assert out[0]["x"].sharding == sh


def test_shard_batch_and_replicated():
    mesh = make_mesh(8)
    batch = shard_batch({"x": np.zeros((16, 4), np.float32)}, mesh)
    assert batch["x"].sharding == batch_sharding(mesh)
    r = jax.device_put(jnp.zeros((4,)), replicated(mesh))
    assert r.sharding.is_fully_replicated
