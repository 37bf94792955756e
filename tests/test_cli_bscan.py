import json
import os

import numpy as np
import pytest

from pautdx import cli
from pautdx.data import synthetic


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw_bscan")
    spec = synthetic.VolumeSpec(n_beams=5, n_scans=12, n_samples=96, seed=51)
    synthetic.write_json_volume(str(d / "v.json"), spec)
    return str(d)


@pytest.mark.parametrize("detector", ["yolo", "dfine"])
def test_predict_bscan_cli(raw_dir, tmp_path, detector):
    out = str(tmp_path / f"det_{detector}")
    cli.main(["predict-bscan", "--data", raw_dir, "--out", out,
              "--detector", detector, "--size", "64",
              "--threshold", "0.0", "--overlays"])
    dets = json.load(open(os.path.join(out, "detections.json")))
    assert "v" in dets and len(dets["v"]) == 12
    for frame in dets["v"]:
        for d in frame:
            assert set(d) == {"box", "label", "score"}


def test_predict_bscan_cli_fused_attn(raw_dir, tmp_path):
    """--fused-attn: Pallas fused AIFI attention serving path through
    the CLI (interpret-mode kernel on CPU). Detections must match the
    default einsum path exactly on CPU f32 — the graph change is
    param-free and numerically equivalent (test_pallas_ops gates the
    kernel; this gates the CLI wiring)."""
    out_f = str(tmp_path / "det_fused")
    cli.main(["predict-bscan", "--data", raw_dir, "--out", out_f,
              "--detector", "dfine", "--size", "64",
              "--threshold", "0.0", "--fused-attn"])
    out_b = str(tmp_path / "det_base")
    cli.main(["predict-bscan", "--data", raw_dir, "--out", out_b,
              "--detector", "dfine", "--size", "64",
              "--threshold", "0.0"])
    dets_f = json.load(open(os.path.join(out_f, "detections.json")))
    dets_b = json.load(open(os.path.join(out_b, "detections.json")))
    assert len(dets_f["v"]) == 12
    for ff, fb in zip(dets_f["v"], dets_b["v"]):
        assert len(ff) == len(fb)
        for df, db in zip(ff, fb):
            assert df["label"] == db["label"]
            np.testing.assert_allclose(df["score"], db["score"], atol=1e-5)
            np.testing.assert_allclose(df["box"], db["box"], atol=1e-3)


def test_predict_bscan_cli_prepatch(raw_dir, tmp_path):
    """--prepatch: host-side space-to-depth wire format through the CLI.
    Detections must match the default path EXACTLY — the stem consumes
    the host-permuted patches with the same params
    (test_serve.py::test_prepatchified_stem_exact gates the model path;
    this gates the CLI wiring incl. the host-side permutation hook)."""
    out_p = str(tmp_path / "det_prepatch")
    cli.main(["predict-bscan", "--data", raw_dir, "--out", out_p,
              "--detector", "dfine", "--size", "64",
              "--threshold", "0.0", "--prepatch"])
    out_b = str(tmp_path / "det_base2")
    cli.main(["predict-bscan", "--data", raw_dir, "--out", out_b,
              "--detector", "dfine", "--size", "64",
              "--threshold", "0.0"])
    dets_p = json.load(open(os.path.join(out_p, "detections.json")))
    dets_b = json.load(open(os.path.join(out_b, "detections.json")))
    assert len(dets_p["v"]) == 12
    for fp, fb in zip(dets_p["v"], dets_b["v"]):
        assert len(fp) == len(fb)
        for dp, db in zip(fp, fb):
            assert dp["label"] == db["label"]
            np.testing.assert_allclose(dp["score"], db["score"], atol=0)
            np.testing.assert_allclose(dp["box"], db["box"], atol=0)


def test_predict_bscan_cli_int8(raw_dir, tmp_path):
    """--quant int8: activation-int8 serving path through the CLI
    (scales self-calibrated on the first request's frames)."""
    out = str(tmp_path / "det_int8")
    cli.main(["predict-bscan", "--data", raw_dir, "--out", out,
              "--detector", "dfine", "--size", "64",
              "--threshold", "0.0", "--quant", "int8"])
    dets = json.load(open(os.path.join(out, "detections.json")))
    assert "v" in dets and len(dets["v"]) == 12
    for frame in dets["v"]:
        for d in frame:
            assert set(d) == {"box", "label", "score"}
            assert np.isfinite(d["score"])


@pytest.mark.parametrize("detector", ["yolo"])
def test_train_bscan_cli(raw_dir, tmp_path, detector):
    out = str(tmp_path / f"train_{detector}")
    cli.main(["train-bscan", "--data", raw_dir, "--out", out,
              "--detector", detector, "--size", "64", "--epochs", "1",
              "--batch-size", "4", "--augment"])
    assert os.path.exists(os.path.join(out, "metadata.json"))
    meta = json.load(open(os.path.join(out, "metadata.json")))
    assert meta["detector"] == detector


def test_train_temporal_cli(raw_dir, tmp_path):
    out = str(tmp_path / "temporal")
    cli.main(["train-temporal", "--data", raw_dir, "--out", out,
              "--variant", "v3", "--size", "64", "--seq-len", "4",
              "--epochs", "1", "--temporal-layers", "1", "--tiny",
              "--lr", "1e-4"])
    meta = json.load(open(os.path.join(out, "metadata.json")))
    assert meta["variant"] == "v3" and meta["seq_len"] == 4
