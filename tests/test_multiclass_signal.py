"""Multiclass signal flow: class ids through dataset -> SignalSequenceDetector
training with the CE+position objective (SURVEY §2.3: label_map contract,
Health appended as class 0 here)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pautdx.data import synthetic
from pautdx.data.datasets import (
    BatchIterator, SignalSequences, sequences_from_volume,
)
from pautdx.data.volume import parse_json_volume
from pautdx.losses import seq_detector_loss
from pautdx.models.signal import SignalSequenceDetector


@pytest.fixture(scope="module")
def multiclass_ds():
    spec = synthetic.VolumeSpec(n_beams=4, n_scans=60, n_samples=96, seed=61)
    defects = [
        synthetic.SyntheticDefect(0, 3, 5, 20, 0.3, 0.45, label="Delamination"),
        synthetic.SyntheticDefect(0, 3, 35, 50, 0.55, 0.7, label="FO"),
    ]
    vol_arr, _ = synthetic.generate_volume(spec, defects)
    vol = parse_json_volume(synthetic.volume_to_json_dict(vol_arr, defects))
    return sequences_from_volume(vol, seq_len=30)


def test_class_labels_built(multiclass_ds):
    ds = multiclass_ds
    assert ds.label_names == ["Delamination", "FO"]
    assert ds.num_classes == 3
    assert ds.class_labels is not None
    assert set(np.unique(ds.class_labels)) == {0, 1, 2}
    # class id consistent with binary labels
    assert ((ds.class_labels > 0) == (ds.labels > 0)).all()


def test_concatenate_remaps_class_ids(multiclass_ds):
    spec = synthetic.VolumeSpec(n_beams=4, n_scans=60, n_samples=96, seed=62)
    defects = [synthetic.SyntheticDefect(0, 3, 10, 30, 0.4, 0.5, label="Crack")]
    vol_arr, _ = synthetic.generate_volume(spec, defects)
    vol = parse_json_volume(synthetic.volume_to_json_dict(vol_arr, defects))
    other = sequences_from_volume(vol, seq_len=30)
    merged = SignalSequences.concatenate([multiclass_ds, other])
    assert merged.label_names == ["Crack", "Delamination", "FO"]
    # "Crack" sequences now map to id 1
    tail = merged.class_labels[len(multiclass_ds):]
    assert set(np.unique(tail)) <= {0, 1}


def test_seq_detector_multiclass_training(multiclass_ds):
    ds = multiclass_ds
    model = SignalSequenceDetector(num_classes=ds.num_classes, d_model=32,
                                   num_heads=2, num_layers=1, norm="group")
    it = BatchIterator(ds, 4, seed=0)
    batch = next(iter(it))
    assert "class_labels" in batch
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(batch["signals"]), train=False)
    params = variables["params"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def lf(p):
            out = model.apply({"params": p}, batch["signals"], train=False)
            return seq_detector_loss(out, batch["class_labels"],
                                     batch["positions"],
                                     batch["sample_mask"])[0]
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for epoch in range(4):
        for batch in BatchIterator(ds, 4, seed=epoch):
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, loss = step(params, opt_state, jb)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
