"""StableHLO export roundtrip + AE anomaly workflow."""

import numpy as np

import jax
import jax.numpy as jnp

from pautdx.models.signal import MultiSignalClassifier
from pautdx.serve.export import export_signal_model, load_exported
from pautdx.train.anomaly import (
    anomaly_threshold, detect_anomalies, train_autoencoder,
)


def test_export_roundtrip(tmp_path):
    model = MultiSignalClassifier(hidden=(32, 16, 8), num_heads=2)
    x = jnp.zeros((2, 6, 64), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    path = str(tmp_path / "msc.stablehlo")
    export_signal_model(model, variables, (2, 6, 64), path)
    assert (tmp_path / "msc.stablehlo").stat().st_size > 0
    call = load_exported(path)
    rng = np.random.default_rng(0)
    inp = jnp.asarray(rng.normal(size=(2, 6, 64)).astype(np.float32))
    out = np.asarray(call(inp))
    ref = np.asarray(model.apply(variables, inp, train=False))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_anomaly_workflow():
    rng = np.random.default_rng(0)
    healthy = rng.normal(0, 0.1, (256, 64)).astype(np.float32)
    model, variables = train_autoencoder(healthy, epochs=20, batch_size=64)
    thresh = anomaly_threshold(model, variables, healthy, quantile=0.9)
    # anomalous signals: large spikes the AE never saw
    anomalous = healthy[:32].copy()
    anomalous[:, 20:30] += 3.0
    res = detect_anomalies(model, variables, anomalous, thresh)
    assert res["is_anomaly"].mean() > 0.8
    res_h = detect_anomalies(model, variables, healthy[:64], thresh)
    assert res_h["is_anomaly"].mean() < 0.35
