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


def test_trainer_consumes_prefetched_batches_identically():
    """The Trainer's input pipeline (threaded host loader + double-buffered
    device_put) must produce the same training result as the direct path."""
    import numpy as np
    import jax.numpy as jnp
    import optax

    from flax import linen as nn
    from pautdx.train import Trainer

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(1)(x)

    def objective(out, batch):
        loss = jnp.mean((out[..., 0] - batch["y"]) ** 2)
        return loss, {"mse": loss}

    rng = np.random.default_rng(0)
    xs = rng.normal(size=(16, 8)).astype(np.float32)
    ys = rng.normal(size=(16,)).astype(np.float32)

    def batches():
        for a in range(0, 16, 4):
            yield {"signals": xs[a:a + 4], "y": ys[a:a + 4]}

    results = []
    for prefetch in (0, 2):
        opt = optax.sgd(1e-2)
        tr = Trainer(M(), objective, opt, prefetch=prefetch)
        state = tr.init(next(iter(batches())))
        for _ in range(3):
            state, m = tr.train_epoch(state, batches())
        results.append((m["mse"], jax.device_get(state.params)))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        results[0][1], results[1][1])
