"""Shape/NaN smoke tests for the signal model zoo — the formalization of the
reference's __main__ random-tensor self-tests (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pautdx.models.signal import (
    DenseAutoencoder, EnhancedSignalSequenceDetector, Hybrid1DDetLoc,
    SignalSequenceDetector,
)
from pautdx.models.signal.detection_zoo import MODEL_ZOO

B, N, S = 2, 10, 320

# smaller configs for compile speed — output shapes don't depend on depth
TEST_KW = {
    "Simple": dict(num_layers=2, num_heads=4),
    "Complex": dict(num_layers=2),
    "NoiseRobust": dict(num_layers=2),
    "DirectDefect": dict(num_layers=2),
    "FluctuationRobust": dict(num_layers=2, num_heads=4),
    "HybridBinary": dict(num_transformer_layers=2),
    "ModernHybridBinary": dict(num_layers=2),
    "ImprovedMSC": dict(num_layers=2),
    "EnhancedPosition": dict(num_layers=2),
    "FixedEnhancedPosition": dict(num_layers=2),
    "Hybrid": dict(),
    "ConvMSC": dict(num_layers=2),
}


def _init_apply(model, x, train=False):
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, x, train=False)
    extra = {}
    if train:
        extra = {"rngs": {"dropout": jax.random.PRNGKey(1)},
                 "mutable": ["batch_stats"]}
        out = model.apply(variables, x, train=True, **extra)
        out = out[0]  # drop mutated vars
    else:
        out = model.apply(variables, x, train=False)
    return out, variables


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(
        np.random.default_rng(0).normal(size=(B, N, S)).astype(np.float32))


@pytest.mark.parametrize("name", sorted(MODEL_ZOO))
def test_zoo_forward_shapes(name, x):
    model = MODEL_ZOO[name](**TEST_KW.get(name, {}))
    out, _ = _init_apply(model, x)
    if isinstance(out, dict):
        prob = out["prob"]
        if "positions" in out:
            assert out["positions"].shape == (B, N, 2)
            assert np.isfinite(np.asarray(out["positions"])).all()
    elif isinstance(out, list):  # pyramid outputs
        return
    else:
        prob = out
    if name == "SetTransformer":
        assert prob.shape == (B,)
    else:
        assert prob.shape == (B, N)
    p = np.asarray(prob)
    assert np.isfinite(p).all()
    assert (p >= 0).all() and (p <= 1).all()


@pytest.mark.parametrize("name", ["HybridBinary", "ImprovedMSC", "TwoStage"])
def test_zoo_train_mode(name, x):
    model = MODEL_ZOO[name](**TEST_KW.get(name, {}))
    out, _ = _init_apply(model, x, train=True)
    prob = out["prob"] if isinstance(out, dict) else out
    assert np.isfinite(np.asarray(prob)).all()


def test_seq_detector_outputs(x):
    for cls, d in [(SignalSequenceDetector, {}),
                   (EnhancedSignalSequenceDetector, {"d_model": 64,
                                                     "num_layers": 2})]:
        model = cls(num_classes=3, **d)
        out, _ = _init_apply(model, x)
        assert out["class_logits"].shape == (B, N, 3)
        assert out["positions"].shape == (B, N, 2)
        assert out["anomaly"].shape == (B, N)
        assert np.isfinite(np.asarray(out["class_logits"])).all()


def test_detloc1d_pyramid_and_decode(x):
    model = Hybrid1DDetLoc(width=32, d_context=64, num_heads=4)
    outs, _ = _init_apply(model, x)
    assert len(outs) == 3
    assert outs[0]["cls"].shape == (B, N, S // 8)
    assert outs[2]["reg"].shape == (B, N, S // 32, 2)
    score, pos = Hybrid1DDetLoc.decode(outs, S)
    assert score.shape == (B, N)
    assert pos.shape == (B, N, 2)
    assert (np.asarray(pos) >= 0).all() and (np.asarray(pos) <= 1).all()


def test_autoencoder_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 64)).astype(np.float32))
    model = DenseAutoencoder()
    variables = model.init(jax.random.PRNGKey(0), x)
    recon = model.apply(variables, x)
    assert recon.shape == x.shape
    scores = DenseAutoencoder.anomaly_score(recon, x)
    assert scores.shape == (4,)
