import os

import jax
import numpy as np

from pautdx.data import synthetic
from pautdx.data.datasets import load_json_dir
from pautdx.data.volume import parse_json_volume
from pautdx.eval.report import SignalEvaluator, prediction_map
from pautdx.utils import find_gates, guarded, sanitize, StepTimer
from pautdx.viz import (
    draw_boxes_on_image, plot_prediction_heatmap, plot_signal_predictions,
    plot_training_history,
)


def _fake_predict(signals):
    """Oracle predictor: energy in the defect band ~ probability."""
    s = np.asarray(signals)
    p = np.clip(np.abs(s[..., 60:260]).max(-1) - 0.15, 0.01, 0.99)
    return {"prob": p, "positions": np.tile(
        np.asarray([0.3, 0.5], np.float32), s.shape[:2] + (1,))}


def test_signal_evaluator_report(json_volume_dir, tmp_path):
    ds = load_json_dir(json_volume_dir, seq_len=40)
    ev = SignalEvaluator(_fake_predict, batch_size=4)
    report = ev.run(ds, out_dir=str(tmp_path))
    for k in ("accuracy", "precision", "recall", "f1", "mcc", "auc",
              "iou_mean"):
        assert k in report
    assert os.path.exists(tmp_path / "metrics.txt")
    assert os.path.exists(tmp_path / "metrics.csv")
    # this oracle should be far above chance on synthetic data
    assert report["auc"] > 0.6


def test_prediction_map_shape(json_volume_dir):
    import os as _os
    vol = parse_json_volume(_os.path.join(json_volume_dir, "vol0.json"))
    heat = prediction_map(_fake_predict, vol, seq_len=40)
    assert heat.shape == (vol.n_beams, 80)
    assert np.isfinite(heat).all()


def test_autogates_finds_band():
    img, intervals = synthetic.synth_dscan(seed=1)
    gates = find_gates(img)
    assert len(gates) >= 1
    for a, b in gates:
        assert 0 <= a < b <= img.shape[1]


def test_sanitize_and_guarded():
    import jax.numpy as jnp
    x = jnp.asarray([jnp.nan, jnp.inf, -50.0, 5.0])
    y = np.asarray(sanitize(x))
    assert np.isfinite(y).all() and y.max() <= 20.0

    def bad_objective(a):
        return jnp.asarray(jnp.nan), {}

    safe = guarded(bad_objective)
    loss, aux = safe(1.0)
    assert np.isfinite(float(loss))
    assert aux["loss_was_finite"] == 0.0


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] >= 1 and s["mean_s"] >= 0


def test_viz_writes_pngs(tmp_path):
    hist = {"train_loss": [1.0, 0.5], "val_loss": [1.1, 0.6],
            "lr_scale": [1.0, 0.5], "epoch": [0, 1]}
    plot_training_history(hist, str(tmp_path / "hist.png"))
    plot_prediction_heatmap(np.random.rand(6, 80),
                            str(tmp_path / "heat.png"))
    draw_boxes_on_image(np.random.rand(64, 64), [[5, 5, 20, 30]],
                        str(tmp_path / "boxes.png"), labels=["FO"],
                        scores=[0.9])
    plot_signal_predictions(np.random.randn(4, 320),
                            np.asarray([0.9, 0.1, 0.7, 0.2]),
                            np.tile(np.asarray([[0.3, 0.5]]), (4, 1)),
                            str(tmp_path / "signals.png"))
    for name in ("hist.png", "heat.png", "boxes.png", "signals.png"):
        assert (tmp_path / name).stat().st_size > 0


def test_model_dot_structure(tmp_path):
    import jax
    import jax.numpy as jnp
    from pautdx.models.signal import MultiSignalClassifier
    from pautdx.viz.model_graph import save_model_dot

    m = MultiSignalClassifier()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 320)))
    dot = save_model_dot(v["params"], str(tmp_path / "m.dot"), name="msc")
    assert dot.startswith('digraph "msc"')
    assert "params" in dot and "->" in dot
    assert (tmp_path / "m.dot").exists()
