import jax.numpy as jnp
import numpy as np

from pautdx.eval import (
    auc_roc, classification_report, detection_prf, evaluate_map,
    iou_statistics,
)
from pautdx.losses import (
    bce, bce_with_logits, cross_entropy, detection_loss,
    detection_position_loss, enhanced_position_loss, focal_bce_with_logits,
    interval_iou_1d, masked_l1, masked_smooth_l1, seq_detector_loss,
    two_stage_loss,
)


def test_bce_matches_logits_form():
    logits = jnp.asarray([-2.0, 0.0, 3.0])
    targets = jnp.asarray([0.0, 1.0, 1.0])
    a = bce(1 / (1 + jnp.exp(-logits)), targets)
    b = bce_with_logits(logits, targets)
    assert np.allclose(a, b, atol=1e-5)


def test_focal_reduces_easy_examples():
    easy = focal_bce_with_logits(jnp.asarray([5.0]), jnp.asarray([1.0]))
    hard = focal_bce_with_logits(jnp.asarray([-5.0]), jnp.asarray([1.0]))
    assert float(easy) < float(hard)


def test_cross_entropy_basic():
    logits = jnp.asarray([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    labels = jnp.asarray([0, 1])
    assert float(cross_entropy(logits, labels)) < 1e-3


def test_interval_iou():
    a = jnp.asarray([[0.0, 0.5]])
    b = jnp.asarray([[0.25, 0.75]])
    assert np.allclose(interval_iou_1d(a, b), 0.25 / 0.75, atol=1e-6)


def test_masked_regression_ignores_unmasked():
    pred = jnp.asarray([[[0.1, 0.2], [0.9, 0.9]]])
    tgt = jnp.asarray([[[0.1, 0.2], [0.0, 0.0]]])
    mask = jnp.asarray([[1.0, 0.0]])
    assert float(masked_l1(pred, tgt, mask)) < 1e-6
    assert float(masked_smooth_l1(pred, tgt, mask)) < 1e-6


def test_objectives_return_finite():
    B, N = 2, 6
    rng = np.random.default_rng(0)
    prob = jnp.asarray(rng.uniform(0.01, 0.99, (B, N)).astype(np.float32))
    labels = jnp.asarray((rng.random((B, N)) > 0.5).astype(np.float32))
    pos = jnp.asarray(rng.uniform(0, 1, (B, N, 2)).astype(np.float32))
    out = {"prob": prob, "positions": pos,
           "cls_uncertainty": jnp.ones((B, N)) * 0.1,
           "pos_uncertainty": jnp.ones((B, N, 2)) * 0.1}
    for fn in (lambda: detection_loss(prob, labels),
               lambda: detection_position_loss(out, labels, pos),
               lambda: two_stage_loss(out, labels, pos),
               lambda: enhanced_position_loss(pos, pos, labels)):
        loss = fn()[0]
        assert np.isfinite(float(loss))
    seq_out = {"class_logits": jnp.zeros((B, N, 3)),
               "positions": pos, "anomaly": prob}
    loss, aux = seq_detector_loss(seq_out, jnp.zeros((B, N), jnp.int32), pos)
    assert np.isfinite(float(loss))


def test_classification_report_known_values():
    # reproduce BASELINE confusion arithmetic: TN 5385 FP 110 FN 136 TP 1419
    probs = np.concatenate([np.ones(1419), np.zeros(136),
                            np.ones(110), np.zeros(5385)])
    labels = np.concatenate([np.ones(1419 + 136), np.zeros(110 + 5385)])
    r = classification_report(probs, labels)
    assert r["tp"] == 1419 and r["fn"] == 136 and r["fp"] == 110
    assert abs(r["accuracy"] - 0.9651) < 1e-3
    assert abs(r["precision"] - 0.9281) < 1e-3
    assert abs(r["recall"] - 0.9125) < 1e-3
    assert abs(r["f1"] - 0.9202) < 1e-3


def test_auc_perfect_and_random():
    labels = np.asarray([0, 0, 1, 1])
    assert auc_roc(np.asarray([0.1, 0.2, 0.8, 0.9]), labels) == 1.0
    assert abs(auc_roc(np.asarray([0.5, 0.5, 0.5, 0.5]), labels) - 0.5) < 1e-9


def test_iou_statistics_and_prf():
    pred = np.asarray([[0.1, 0.3], [0.5, 0.7]])
    tgt = np.asarray([[0.1, 0.3], [0.0, 0.1]])
    stats = iou_statistics(pred, tgt, np.ones(2))
    assert abs(stats["acc@0.5"] - 0.5) < 1e-9
    prf = detection_prf([[(0.1, 0.3)]], [[(0.1, 0.3), (0.5, 0.6)]])
    assert prf["tp"] == 1 and prf["fn"] == 1 and prf["fp"] == 0


def test_map_perfect_predictions():
    gt = [{"boxes": np.asarray([[0, 0, 10, 10]]), "classes": np.asarray([0])}]
    pred = [{"boxes": np.asarray([[0, 0, 10, 10]]),
             "scores": np.asarray([0.9]), "classes": np.asarray([0])}]
    m = evaluate_map(pred, gt)
    assert m["mAP@0.5"] > 0.99
    miss = [{"boxes": np.asarray([[50, 50, 60, 60]]),
             "scores": np.asarray([0.9]), "classes": np.asarray([0])}]
    assert evaluate_map(miss, gt)["mAP@0.5"] < 0.01
