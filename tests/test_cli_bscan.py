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
