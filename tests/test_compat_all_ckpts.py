"""Import every shipped reference MSC checkpoint (OPD 320 + FPD 360
signal lengths) and verify outputs are sane probabilities — the full
`.pth` compatibility sweep of SURVEY §4 point (b)."""

import glob
import os

import numpy as np
import pytest

import jax.numpy as jnp

from pautdx.compat import import_msc, load_state_dict
from pautdx.models.signal import MultiSignalClassifier

CKPTS = sorted(glob.glob("/root/reference/signals/MultiSignalClassifier_model*.pth"))


@pytest.mark.skipif(not CKPTS, reason="reference checkpoints unavailable")
@pytest.mark.parametrize("path", CKPTS, ids=[os.path.basename(p) for p in CKPTS])
def test_import_every_msc_checkpoint(path):
    sd = load_state_dict(path)
    signal_length = sd["shared_layer.0.weight"].shape[1]
    variables = import_msc(sd)
    model = MultiSignalClassifier(hidden=(128, 64, 32), num_heads=4)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 6, signal_length)).astype(np.float32))
    out = np.asarray(model.apply(variables, x, train=False))
    assert out.shape == (1, 6)
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1).all()
    # responds to input (or confidently rejects pure noise everywhere —
    # some shipped checkpoints saturate to ~0 on random inputs)
    x2 = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 6, signal_length)).astype(np.float32) * 3)
    out2 = np.asarray(model.apply(variables, x2, train=False))
    assert (not np.allclose(out, out2)) or (out.max() < 0.01)


ONNX_CKPTS = sorted(glob.glob("/root/reference/signals/*.onnx"))


@pytest.mark.skipif(not ONNX_CKPTS, reason="reference onnx unavailable")
@pytest.mark.parametrize("path", ONNX_CKPTS,
                         ids=[os.path.basename(p) for p in ONNX_CKPTS])
def test_import_onnx_checkpoints(path):
    """BASELINE config 2: the `.onnx` artifacts load through the
    dependency-free protobuf walker and run through the flax MSC."""
    from pautdx.compat.onnx_import import import_msc_onnx

    variables = import_msc_onnx(path)
    signal_length = variables["params"]["embed"]["Dense_0"]["kernel"].shape[0]
    model = MultiSignalClassifier(hidden=(128, 64, 32), num_heads=4)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 5, signal_length)).astype(np.float32))
    out = np.asarray(model.apply(variables, x, train=False))
    assert out.shape == (1, 5)
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1).all()


@pytest.mark.skipif(not os.path.exists(
    "/root/reference/signals/MultiSignalClassifier4_dynamic.onnx"),
    reason="reference onnx unavailable")
def test_onnx_weights_consistent_with_numpy_oracle():
    """ONNX import == independent numpy math on the raw ONNX tensors."""
    from pautdx.compat.onnx_import import (
        import_msc_onnx, load_onnx_initializers,
    )
    path = "/root/reference/signals/MultiSignalClassifier4_dynamic.onnx"
    w = load_onnx_initializers(path)
    variables = import_msc_onnx(path)
    model = MultiSignalClassifier(hidden=(128, 64, 32), num_heads=4)
    S = w["shared_layer.0.weight"].shape[1]
    x = np.random.default_rng(1).normal(size=(1, 4, S)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    # reconstruct a torch-layout state dict and reuse the .pth oracle
    from tests.test_compat_torch import numpy_msc_forward
    sd = {
        "shared_layer.0.weight": w["shared_layer.0.weight"],
        "shared_layer.0.bias": w["shared_layer.0.bias"],
        "shared_layer.2.weight": w["shared_layer.2.weight"],
        "shared_layer.2.bias": w["shared_layer.2.bias"],
        "attention.in_proj_weight": w["onnx::MatMul_128"].T,
        "attention.in_proj_bias": w["attention.in_proj_bias"],
        "attention.out_proj.weight": w["attention.out_proj.weight"],
        "attention.out_proj.bias": w["attention.out_proj.bias"],
        "classifier.0.weight": w["onnx::MatMul_129"].T,
        "classifier.0.bias": w["classifier.0.bias"],
        "classifier.2.weight": w["onnx::MatMul_130"].T,
        "classifier.2.bias": w["classifier.2.bias"],
    }
    expected = numpy_msc_forward(sd, x)
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


@pytest.mark.skipif(not os.path.exists(
    "/root/reference/signals/set_transformer_model.pth"),
    reason="reference checkpoints unavailable")
def test_import_set_transformer():
    from pautdx.compat.torch_import import import_set_transformer
    from pautdx.models.signal import SetTransformer

    sd = load_state_dict("/root/reference/signals/set_transformer_model.pth")
    variables = import_set_transformer(sd)
    model = SetTransformer(d_model=128, num_heads=4)
    S = sd["encoder.0.weight"].shape[1]
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(3, 7, S)).astype(np.float32))
    out = np.asarray(model.apply(variables, x, train=False))
    assert out.shape == (3,)
    assert np.isfinite(out).all() and (out >= 0).all() and (out <= 1).all()


@pytest.mark.parametrize("name,prefix,hidden", [
    ("signal_classifier_model2.pth", "shared_layer", (64, 32)),
    ("anomaly_detector_model.pth", "network", (128, 64, 32)),
])
def test_import_mlp_classifiers(name, prefix, hidden):
    path = f"/root/reference/signals/{name}"
    if not os.path.exists(path):
        pytest.skip("reference checkpoints unavailable")
    from pautdx.compat.torch_import import import_mlp_classifier
    from pautdx.models.signal import SignalClassifierMLP

    sd = load_state_dict(path)
    variables = import_mlp_classifier(sd, prefix)
    model = SignalClassifierMLP(hidden=hidden)
    x = np.random.default_rng(0).normal(size=(1, 4, 320)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert got.shape == (1, 4)
    # numpy oracle: plain MLP with ReLU between layers, sigmoid at the end
    h = x.reshape(4, 320)
    ws = sorted({int(k.split(".")[1]) for k in sd if k.endswith(".weight")})
    for i, j in enumerate(ws):
        h = h @ sd[f"{prefix}.{j}.weight"].T + sd[f"{prefix}.{j}.bias"]
        if i < len(ws) - 1:
            h = np.maximum(h, 0)
    expected = (1 / (1 + np.exp(-h[..., 0])))[None]
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)
