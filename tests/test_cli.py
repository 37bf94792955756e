"""End-to-end CLI: build-dataset -> train -> eval -> predict -> bridge."""

import io
import json
import os

import numpy as np
import pytest

from pautdx import cli
from pautdx.data import synthetic


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    spec = synthetic.VolumeSpec(n_beams=5, n_scans=60, n_samples=160, seed=21)
    synthetic.write_json_volume(str(d / "volA.json"), spec)
    spec2 = synthetic.VolumeSpec(n_beams=5, n_scans=60, n_samples=160, seed=22)
    synthetic.write_txt_tree(str(d), spec2, file_folder="fileB")
    return str(d)


def test_build_dataset_cli(raw_dir, tmp_path):
    out = str(tmp_path / "ds")
    cli.main(["build-dataset", "--data", raw_dir, "--out", out,
              "--size", "64", "--yolo"])
    ann = json.load(open(os.path.join(out, "annotations.json")))
    assert set(ann) == {"volA", "fileB"}
    assert os.path.exists(os.path.join(out, "volA", "0.npy"))
    assert os.path.exists(os.path.join(out, "yolo", "data.yaml"))
    img = np.load(os.path.join(out, "volA", "0.npy"))
    assert img.shape == (64, 64)


@pytest.fixture(scope="module")
def trained(raw_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    cli.main(["train-signal", "--data", raw_dir, "--out", out,
              "--model", "MLP", "--recipe", "detection",
              "--epochs", "2", "--batch-size", "4", "--seq-len", "30"])
    return out


def test_train_signal_cli(trained):
    assert os.path.exists(os.path.join(trained, "history.json"))
    assert os.path.exists(os.path.join(trained, "metadata.json"))
    assert os.path.exists(os.path.join(trained, "history.png"))
    meta = json.load(open(os.path.join(trained, "metadata.json")))
    assert meta["model"] == "MLP"


def test_eval_signal_cli(trained, raw_dir, tmp_path, capsys):
    out = str(tmp_path / "eval")
    cli.main(["eval-signal", "--data", raw_dir, "--checkpoint", trained,
              "--out", out])
    report = json.load(open(os.path.join(out, "metrics.json")))
    assert 0.0 <= report["accuracy"] <= 1.0


def test_predict_signal_cli(trained, raw_dir, tmp_path):
    out = str(tmp_path / "preds")
    cli.main(["predict-signal", "--data", raw_dir, "--checkpoint", trained,
              "--out", out, "--heatmaps"])
    preds = json.load(open(os.path.join(out, "predictions.json")))
    assert "volA.json" in preds
    heat = np.asarray(preds["volA.json"]["probabilities"])
    assert heat.shape == (5, 60)
    assert os.path.exists(os.path.join(out, "volA.png"))


def test_export_cli(trained, tmp_path):
    out = str(tmp_path / "model.stablehlo")
    cli.main(["export", "--checkpoint", trained, "--out", out,
              "--num-signals", "30", "--signal-length", "160"])
    assert os.path.getsize(out) > 0
    from pautdx.serve.export import load_exported
    import jax.numpy as jnp
    call = load_exported(out)
    y = call(jnp.zeros((1, 30, 160)))
    assert np.asarray(y).shape == (1, 30)


def test_bridge_cli(trained, monkeypatch, capsys):
    import io
    sig = np.random.default_rng(5).normal(size=(6, 160)).astype(np.float32)
    monkeypatch.setattr("sys.stdin", io.StringIO(
        json.dumps({"signals": sig.tolist()})))
    cli.main(["bridge", "--checkpoint", trained])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(payload["prob"][0]) == 6
    assert set(payload) >= {"prob", "pred"}
