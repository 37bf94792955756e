"""Native C++ IO: parity with the Python parsers on synthetic data."""

import os

import numpy as np
import pytest

from pautdx import native
from pautdx.data import synthetic
from pautdx.data.volume import parse_json_volume


@pytest.mark.skipif(not native.native_available(),
                    reason="g++ unavailable / native build failed")
def test_load_ascan_txt_matches_loadtxt(tmp_path):
    sig = np.random.default_rng(0).normal(size=257).astype(np.float32)
    path = str(tmp_path / "3_Health.txt")
    np.savetxt(path, sig)
    fast = native.load_ascan_txt(path)
    ref = np.loadtxt(path, dtype=np.float32)
    np.testing.assert_allclose(fast, ref, rtol=1e-6)


@pytest.mark.skipif(not native.native_available(),
                    reason="g++ unavailable / native build failed")
def test_parse_json_volume_fast_parity(tmp_path):
    spec = synthetic.VolumeSpec(n_beams=5, n_scans=30, n_samples=96, seed=9)
    path = str(tmp_path / "vol.json")
    synthetic.write_json_volume(path, spec)
    fast = native.parse_json_volume_fast(path)
    ref = parse_json_volume(path, use_native=False)
    assert fast.beam_keys == ref.beam_keys
    for bk in ref.beam_keys:
        np.testing.assert_allclose(fast.signals[bk], ref.signals[bk],
                                   atol=1e-5)
        assert [i.label for i in fast.scan_infos[bk]] == \
            [i.label for i in ref.scan_infos[bk]]
        assert np.allclose(
            [i.position for i in fast.scan_infos[bk]],
            [i.position for i in ref.scan_infos[bk]], atol=1e-6)


@pytest.mark.skipif(not native.native_available(),
                    reason="g++ unavailable / native build failed")
def test_native_faster_than_python(tmp_path):
    import json
    import time

    spec = synthetic.VolumeSpec(n_beams=8, n_scans=100, n_samples=320, seed=2)
    path = str(tmp_path / "big.json")
    synthetic.write_json_volume(path, spec)
    t0 = time.perf_counter()
    native.parse_json_volume_fast(path)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    parse_json_volume(path, use_native=False)
    t_py = time.perf_counter() - t0
    # informative, not strict — CI noise tolerated, but native should not
    # be dramatically slower
    assert t_native < t_py * 2.0, (t_native, t_py)


def _write_txt_tree(base, n_beams=4, n_scans=10, n_samples=64, seed=3):
    rng = np.random.default_rng(seed)
    for b in range(n_beams):
        d = base / f"beam_{b}_{40 + b}"
        d.mkdir(parents=True)
        for s in range(n_scans):
            name = (f"{s}_Health.txt" if (s + b) % 3 else
                    f"{s}_FO_0.25-0.5.txt")
            np.savetxt(str(d / name),
                       rng.normal(size=n_samples).astype(np.float32))


@pytest.mark.skipif(not native.native_available(),
                    reason="g++ unavailable / native build failed")
def test_parse_ascan_tree_fast_parity(tmp_path):
    _write_txt_tree(tmp_path / "vol")
    tree = native.parse_ascan_tree_fast(str(tmp_path / "vol"))
    assert tree is not None and len(tree) == 40
    for rel, arr in tree.items():
        ref = np.loadtxt(str(tmp_path / "vol" / rel), dtype=np.float32)
        np.testing.assert_allclose(arr, ref, rtol=1e-6)


@pytest.mark.skipif(not native.native_available(),
                    reason="g++ unavailable / native build failed")
def test_parse_txt_tree_native_matches_python(tmp_path):
    from pautdx.data.volume import parse_txt_tree

    _write_txt_tree(tmp_path / "volA", n_beams=3, n_scans=7)
    fast = parse_txt_tree(str(tmp_path), "volA", use_native=True)
    ref = parse_txt_tree(str(tmp_path), "volA", use_native=False)
    assert fast.beam_keys == ref.beam_keys
    for bk in ref.beam_keys:
        np.testing.assert_allclose(fast.signals[bk], ref.signals[bk],
                                   rtol=1e-6)
        assert [i.label for i in fast.scan_infos[bk]] == \
            [i.label for i in ref.scan_infos[bk]]
