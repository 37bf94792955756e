"""Temporal D-FINE end-to-end: synthetic B-scan sequence -> temporal model
-> per-frame DETR criterion (+v3 anomaly consistency) -> loss decreases
with the trunk frozen (reference training setup, `temporal_dfine.py:249-314`)."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from pautdx.data import synthetic
from pautdx.data.vision import detection_frames_from_volume, sequence_chunks
from pautdx.data.volume import parse_json_volume
from pautdx.losses.detr import dfine_criterion
from pautdx.models.vision.temporal_dfine import (
    TemporalDFine, temporal_consistency_loss,
)
from tests.test_dfine_train import TINY

IMG = 64
T = 4


@pytest.fixture(scope="module")
def sequence():
    spec = synthetic.VolumeSpec(n_beams=6, n_scans=8, n_samples=128, seed=41)
    defects = [synthetic.SyntheticDefect(1, 4, 0, 7, 0.3, 0.5)]
    vol_arr, _ = synthetic.generate_volume(spec, defects)
    vol = parse_json_volume(synthetic.volume_to_json_dict(vol_arr, defects))
    frames = detection_frames_from_volume(vol, out_size=IMG, max_boxes=2)
    chunk = sequence_chunks(frames, seq_len=T, require_gt=True)[0]
    return chunk


def test_temporal_training_loss_decreases(sequence):
    model = TemporalDFine(TINY, variant="v3", num_temporal_layers=1,
                          temporal_heads=4)
    images = jnp.asarray(sequence.images[:T])
    gt_boxes = jnp.asarray(sequence.normalized_cxcywh()[:T])
    gt_classes = jnp.asarray(sequence.classes[:T])
    gt_mask = jnp.asarray(sequence.mask[:T])

    variables = model.init({"params": jax.random.PRNGKey(0)}, images,
                           train=False)
    params = variables["params"]
    bstats = variables["batch_stats"]

    # reference optimizer setup: trunk frozen, temporal parts trainable
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p):
        out = model.apply({"params": p, "batch_stats": bstats}, images,
                          train=True,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        head_out = {
            "intermediate_logits": [out["logits"]],
            "intermediate_boxes": [out["pred_boxes"]],
            "intermediate_corners": [],
            "initial_references": [],
        }
        loss, aux = dfine_criterion(head_out, gt_boxes, gt_classes, gt_mask,
                                    TINY.num_labels, TINY.max_num_bins)
        loss = loss + 0.1 * temporal_consistency_loss(out["anomaly"])
        return loss

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, grads

    losses = []
    for _ in range(5):
        params, opt_state, loss, grads = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # v3 trains the trunk decoder (reference unfreezes all but backbone);
    # gradient flow into the trunk is therefore EXPECTED — the backbone
    # freeze is an optimizer-mask concern (see trainable_mask tests)
    assert float(optax.global_norm(grads["trunk"])) > 0.0
    assert float(optax.global_norm(grads["temporal_encoder"])) > 0.0
    assert float(optax.global_norm(grads["anomaly_detector.0"])) > 0.0


def test_v1_trunk_stays_gradient_free(sequence):
    """v1 freezes the whole trunk: stop_gradient cuts the graph."""
    model = TemporalDFine(TINY, variant="v1", num_temporal_layers=1,
                          temporal_heads=4)
    images = jnp.asarray(sequence.images[:T])
    gt_boxes = jnp.asarray(sequence.normalized_cxcywh()[:T])
    gt_classes = jnp.asarray(sequence.classes[:T])
    gt_mask = jnp.asarray(sequence.mask[:T])
    variables = model.init({"params": jax.random.PRNGKey(0)}, images,
                           train=False)
    params, bstats = variables["params"], variables["batch_stats"]

    def loss_fn(p):
        out = model.apply({"params": p, "batch_stats": bstats}, images,
                          train=True,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        head_out = {
            "intermediate_logits": [out["logits"]],
            "intermediate_boxes": [out["pred_boxes"]],
            "intermediate_corners": [],
            "initial_references": [],
        }
        loss, _ = dfine_criterion(head_out, gt_boxes, gt_classes, gt_mask,
                                  TINY.num_labels, TINY.max_num_bins)
        return loss

    grads = jax.jit(jax.grad(loss_fn))(params)
    assert float(optax.global_norm(grads["trunk"])) == 0.0
    assert float(optax.global_norm(grads["temporal_encoder"])) > 0.0
