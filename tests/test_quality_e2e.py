"""Flagship quality integration: the round-1 'minimum slice' at full
strength. Train HybridBinary on defect-focused synthetic volumes until it
actually separates classes (AUC), then evaluate with the harness and emit
the reference-format metrics artifact (BASELINE.md's Complex_metrics.txt
schema: accuracy/precision/recall/F1/MCC + confusion counts)."""

import os

import numpy as np
import pytest

from pautdx.data import synthetic
from pautdx.data.datasets import (
    BatchIterator, defect_focused, load_json_dir, train_val_split,
)
from pautdx.eval.report import SignalEvaluator
from pautdx.losses import detection_loss
from pautdx.models.signal import HybridBinaryModel
from pautdx.train import Trainer, make_optimizer


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("quality_volumes")
    for i in range(6):
        spec = synthetic.VolumeSpec(n_beams=5, n_scans=60, n_samples=128,
                                    seed=200 + i)
        synthetic.write_json_volume(str(d / f"v{i}.json"), spec)
    ds = defect_focused(load_json_dir(str(d), seq_len=30))
    return train_val_split(ds, 0.25, seed=42)


def test_hybrid_binary_learns_and_reports(data, tmp_path):
    train_ds, val_ds = data
    model = HybridBinaryModel(hidden_sizes=(64, 32, 16), num_heads=4,
                              num_transformer_layers=1, pooled_len=32,
                              norm="group")
    trainer = Trainer(
        model,
        lambda out, batch: detection_loss(out, batch["labels"],
                                          batch.get("sample_mask")),
        make_optimizer(1e-3, weight_decay=0.01))
    state = trainer.init(next(iter(BatchIterator(train_ds, 8, seed=0))))
    state = trainer.fit(
        state,
        lambda: BatchIterator(train_ds, 8, seed=1),
        epochs=10, log=lambda s: None)

    import jax
    import jax.numpy as jnp

    variables = {"params": state.params}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats

    @jax.jit
    def predict(signals):
        return model.apply(variables, jnp.asarray(signals), train=False)

    report = SignalEvaluator(predict, batch_size=8).run(
        val_ds, out_dir=str(tmp_path))

    # real learning, not chance
    assert report["auc"] > 0.75, report
    assert report["accuracy"] > 0.7, report

    # artifact matches the reference metrics.txt schema (BASELINE.md)
    text = open(os.path.join(tmp_path, "metrics.txt")).read()
    for key in ("accuracy", "precision", "recall", "f1", "mcc",
                "tn", "fp", "fn", "tp"):
        assert key in text
