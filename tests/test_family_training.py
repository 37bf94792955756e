"""E2E training smoke for the remaining objective families:
enhanced-position (FocalL1+IoU+length+consistency), two-stage
(BCE+L1+uncertainty), and the anchor-free DetLoc 1D heatmap criterion —
each trains on synthetic data and the loss decreases."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from pautdx.data import synthetic
from pautdx.data.datasets import BatchIterator, defect_focused, sequences_from_volume
from pautdx.data.volume import parse_json_volume
from pautdx.losses import enhanced_position_loss, two_stage_loss
from pautdx.losses.heatmap import detloc_criterion
from pautdx.models.signal import (
    EnhancedPositionMSC, Hybrid1DDetLoc, TwoStageDetector,
)

S = 96


@pytest.fixture(scope="module")
def ds():
    spec = synthetic.VolumeSpec(n_beams=4, n_scans=60, n_samples=S, seed=71)
    defects = [synthetic.SyntheticDefect(0, 3, 10, 45, 0.35, 0.55)]
    vol_arr, _ = synthetic.generate_volume(spec, defects)
    vol = parse_json_volume(synthetic.volume_to_json_dict(vol_arr, defects))
    return defect_focused(sequences_from_volume(vol, seq_len=20))


def _train(model, objective, ds, steps=8, lr=1e-3, has_stats=True):
    batch = next(iter(BatchIterator(ds, 4, seed=0)))
    x = jnp.asarray(batch["signals"])
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, bstats, opt_state, batch):
        def lf(p):
            vs = {"params": p}
            mutable = []
            if jax.tree_util.tree_leaves(bstats):
                vs["batch_stats"] = bstats
                mutable = ["batch_stats"]
            out, mut = model.apply(vs, batch["signals"], train=True,
                                   rngs={"dropout": jax.random.PRNGKey(1)},
                                   mutable=mutable)
            loss = objective(out, batch)
            new_bs = mut.get("batch_stats", bstats) if mutable else bstats
            return loss, new_bs
        (loss, new_bs), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    losses = []
    it = list(BatchIterator(ds, 4, seed=1))
    for i in range(steps):
        batch = {k: jnp.asarray(v) for k, v in it[i % len(it)].items()}
        params, bstats, opt_state, loss = step(params, bstats, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    return losses


def test_enhanced_position_training(ds):
    model = EnhancedPositionMSC(d_model=32, num_heads=2, num_layers=1,
                                norm="group")

    def objective(out, batch):
        loss, _ = enhanced_position_loss(out["positions"], batch["positions"],
                                         batch["labels"])
        return loss

    _train(model, objective, ds)


def test_two_stage_training(ds):
    model = TwoStageDetector(d_model=32, num_heads=2, num_layers=1,
                             norm="group")

    def objective(out, batch):
        return two_stage_loss(out, batch["labels"], batch["positions"])[0]

    _train(model, objective, ds)


def test_detloc1d_training(ds):
    model = Hybrid1DDetLoc(width=16, d_context=32, num_heads=2,
                           num_context_layers=1)

    def objective(outs, batch):
        return detloc_criterion(outs, batch["labels"], batch["positions"], S)[0]

    _train(model, objective, ds, steps=8, lr=2e-3)
