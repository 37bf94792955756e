"""End-to-end: synthetic volumes -> datasets -> Trainer on a dp mesh ->
metrics -> checkpoint save/restore. The round-1 'minimum slice' of
SURVEY.md §7 build order (HybridBinary on TPU-style sharding)."""

import numpy as np
import pytest

import jax

from pautdx.data import synthetic
from pautdx.data.datasets import BatchIterator, load_json_dir, train_val_split
from pautdx.losses import detection_loss
from pautdx.mesh import make_mesh
from pautdx.models.signal import HybridBinaryModel
from pautdx.train import (
    CheckpointManager, ReduceLROnPlateau, Trainer, make_optimizer,
)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e_volumes")
    for i in range(4):
        spec = synthetic.VolumeSpec(n_beams=6, n_scans=80, n_samples=160,
                                    seed=100 + i)
        synthetic.write_json_volume(str(d / f"v{i}.json"), spec)
    ds = load_json_dir(str(d), seq_len=40)
    return train_val_split(ds, 0.2, seed=42)


def _objective(out, batch):
    return detection_loss(out, batch["labels"], batch.get("sample_mask"))


def _accuracy(out, batch):
    pred = (np.asarray(out) >= 0.5).astype(np.float32)
    return float((pred == np.asarray(batch["labels"])).mean())


def test_train_hybrid_binary_dp_mesh(data, tmp_path):
    train_ds, val_ds = data
    model = HybridBinaryModel(hidden_sizes=(64, 32, 16), num_heads=4,
                              num_transformer_layers=1, pooled_len=32,
                              norm="group")
    mesh = make_mesh(8)
    opt = make_optimizer(learning_rate=1e-3, weight_decay=0.01)
    trainer = Trainer(model, _objective, opt, mesh=mesh,
                      checkpoint_dir=str(tmp_path / "ckpt"))
    batch = next(iter(BatchIterator(train_ds, 8, seed=0)))
    state = trainer.init(batch)

    state = trainer.fit(
        state,
        train_batches_fn=lambda: BatchIterator(train_ds, 8, seed=1),
        val_batches_fn=lambda: BatchIterator(val_ds, 8, shuffle=False,
                                             drop_remainder=False),
        epochs=6,
        plateau=ReduceLROnPlateau(patience=2),
        log=lambda s: None,
    )
    hist = trainer.history
    assert hist["train_bce"][-1] < hist["train_bce"][0]
    assert np.isfinite(hist["val_loss"]).all()

    # eval accuracy above chance on this easy synthetic task
    aux, collected = trainer.evaluate(
        state, BatchIterator(val_ds, 8, shuffle=False, drop_remainder=False),
        collect=_accuracy)
    assert np.mean(collected) > 0.55

    # checkpoint roundtrip restores identical params
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    assert ckpt.has_checkpoint
    restored, meta = ckpt.restore("latest", target=jax.device_get(state))
    r0 = jax.tree_util.tree_leaves(restored.params)[0]
    s0 = jax.tree_util.tree_leaves(jax.device_get(state).params)[0]
    assert np.allclose(r0, s0)


def test_history_contract(data, tmp_path):
    """History carries the reference's per-epoch keys (SURVEY.md §5.5)."""
    train_ds, val_ds = data
    model = HybridBinaryModel(hidden_sizes=(32, 16, 8), num_heads=2,
                              num_transformer_layers=1, pooled_len=16,
                              norm="group")
    opt = make_optimizer(1e-3)
    trainer = Trainer(model, _objective, opt,
                      checkpoint_dir=str(tmp_path / "c2"))
    state = trainer.init(next(iter(BatchIterator(train_ds, 4, seed=0))))
    trainer.fit(state,
                lambda: BatchIterator(train_ds, 4, seed=2),
                lambda: BatchIterator(val_ds, 4, shuffle=False),
                epochs=2, log=lambda s: None)
    ckpt = CheckpointManager(str(tmp_path / "c2"))
    hist = ckpt.load_history()
    for key in ("epoch", "train_bce", "val_loss", "lr_scale", "time_s"):
        assert key in hist and len(hist[key]) == 2


def test_trainer_guards_nonfinite_loss(data):
    """A poisoned batch (NaN signals) must not produce NaN params."""
    train_ds, _ = data
    model = HybridBinaryModel(hidden_sizes=(32, 16, 8), num_heads=2,
                              num_transformer_layers=1, pooled_len=16,
                              norm="group")
    trainer = Trainer(model, _objective, make_optimizer(1e-3))
    batch = next(iter(BatchIterator(train_ds, 4, seed=0)))
    state = trainer.init(batch)

    poisoned = dict(batch)
    poisoned["signals"] = batch["signals"].copy()
    poisoned["signals"][0] = np.nan
    state, aux = trainer.train_epoch(state, [poisoned])
    assert aux["loss_was_finite"] == 0.0
    assert aux["update_was_finite"] == 0.0
    for l in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(l)).all()
    for l in jax.tree_util.tree_leaves(state.opt_state):
        assert np.isfinite(np.asarray(l)).all()
    # a healthy batch afterwards still trains normally
    state, aux = trainer.train_epoch(state, [batch])
    assert aux["update_was_finite"] == 1.0
