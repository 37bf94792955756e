"""Robustness corners: ragged volumes, empty dirs, malformed keys,
polymorphic export, profiling trace smoke."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pautdx.data.datasets import load_json_dir, sequences_from_volume
from pautdx.data.volume import parse_json_volume
from pautdx.models.signal import MultiSignalClassifier


def test_ragged_volume_padded_and_windowed(tmp_path):
    """Beams with differing scan counts and signal lengths (SURVEY §7
    'Ragged PAUT volumes'): parser right-pads ragged signals; windowing
    keeps the majority length and skips short beams."""
    vol_dict = {
        "beam_0.0": {f"{i}_Health": list(np.zeros(64)) for i in range(40)},
        "beam_1.0": {f"{i}_Health": list(np.zeros(64)) for i in range(25)},
        # ragged signal length inside one beam
        "beam_2.0": {
            **{f"{i}_Health": list(np.zeros(64)) for i in range(39)},
            "39_Health": list(np.zeros(50)),
        },
    }
    vol = parse_json_volume(vol_dict)
    assert vol.signals["beam_2.0"].shape == (40, 64)   # right-padded
    ds = sequences_from_volume(vol, seq_len=30)
    # beam_1 (25 scans) contributes nothing; beams 0 and 2 give 2 windows each
    assert len(ds) == 4
    assert ds.signals.shape[1:] == (30, 64)


def test_load_json_dir_skips_garbage(tmp_path):
    (tmp_path / "bad.json").write_text("{not json")
    (tmp_path / "other.txt").write_text("hello")
    ds = load_json_dir(str(tmp_path), seq_len=10)
    assert len(ds) == 0


def test_malformed_scan_keys_tolerated():
    vol_dict = {"beam_0.0": {
        "0_Health": list(np.zeros(32)),
        "1_Defect_garbage": list(np.zeros(32)),   # malformed range
        "2_Defect_0.2-0.4": list(np.zeros(32)),
    }}
    vol = parse_json_volume(vol_dict)
    infos = vol.scan_infos["beam_0.0"]
    assert infos[1].is_defect and infos[1].position == (0.0, 0.0)
    assert np.allclose(infos[2].position, (0.2, 0.4))


def test_polymorphic_batch_export(tmp_path):
    from pautdx.serve.export import export_forward

    model = MultiSignalClassifier(hidden=(16, 8, 4), num_heads=2)
    x = jnp.zeros((2, 4, 32), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def fwd(signals):
        return model.apply(variables, signals, train=False)

    exported = export_forward(fwd, (x,), polymorphic_batch=True)
    # callable on a DIFFERENT batch size
    y = exported.call(jnp.zeros((5, 4, 32), jnp.float32))
    assert y.shape == (5, 4)


def test_profiler_trace_smoke(tmp_path):
    from pautdx.utils.profiling import trace

    with trace(str(tmp_path / "trace")):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    found = []
    for root, _, files in os.walk(tmp_path / "trace"):
        found.extend(files)
    assert found  # profiler wrote something
