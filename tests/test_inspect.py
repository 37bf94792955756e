"""HTML inspector: stdlib PNG encoder roundtrip + bscan/signal pages
(the reference's PyQt6 QA apps re-designed as self-contained HTML —
`display_defects.py`, `signal_visualizer.py`, `model_tester.py`)."""

import json
import struct
import zlib

import numpy as np
import pytest

from pautdx import cli
from pautdx.data import synthetic
from pautdx.viz.inspect import (
    build_bscan_inspector, build_signal_inspector, png_bytes,
)


def _decode_png(data: bytes):
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, {}
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        chunks.setdefault(tag, b"")
        chunks[tag] += data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    w, h, depth, color = struct.unpack(">IIBB", chunks[b"IHDR"][:10])
    raw = zlib.decompress(chunks[b"IDAT"])
    ch = {0: 1, 2: 3}[color]
    rows = []
    stride = w * ch + 1
    for y in range(h):
        line = raw[y * stride:(y + 1) * stride]
        assert line[0] == 0          # filter None
        rows.append(np.frombuffer(line[1:], np.uint8))
    arr = np.stack(rows).reshape(h, w, ch)
    return arr[..., 0] if ch == 1 else arr


def test_png_roundtrip_gray_and_rgb():
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    np.testing.assert_array_equal(_decode_png(png_bytes(gray)), gray)
    rgb = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    np.testing.assert_array_equal(_decode_png(png_bytes(rgb)), rgb)
    # float [0, 1] input is scaled to uint8
    f = np.linspace(0, 1, 64).reshape(8, 8).astype(np.float32)
    out = _decode_png(png_bytes(f))
    assert out.min() == 0 and out.max() == 255


def test_bscan_inspector_page(tmp_path):
    imgs = np.random.default_rng(0).uniform(size=(3, 32, 32)).astype(np.float32)
    gt = [[{"box": [2, 2, 12, 12], "label": "FO"}], [], []]
    pred = [[{"box": [3, 3, 11, 13], "label": 1, "score": 0.9}], [], []]
    out = str(tmp_path / "b.html")
    build_bscan_inspector(
        [{"name": "v1", "images": imgs, "gt": gt, "pred": pred}], out)
    page = open(out).read()
    assert "data:image/png;base64," in page
    blob = page.split('id="data">')[1].split("</script>")[0]
    d = json.loads(blob)
    assert len(d["sequences"][0]["frames"]) == 3
    assert d["sequences"][0]["frames"][0]["gt"][0]["label"] == "FO"
    assert d["sequences"][0]["frames"][0]["pred"][0]["score"] == 0.9


def test_signal_inspector_page(tmp_path):
    rng = np.random.default_rng(1)
    out = str(tmp_path / "s.html")
    build_signal_inspector([{
        "name": "v1/beam0",
        "signals": rng.normal(size=(6, 40)).astype(np.float32),
        "labels": [0, 1, 0, 0, 1, 0],
        "positions": [[0, 0], [0.2, 0.5], [0, 0], [0, 0], [0.4, 0.6], [0, 0]],
        "probs": [0.1, 0.9, 0.2, 0.1, 0.8, 0.05],
    }], out)
    d = json.loads(open(out).read().split('id="data">')[1].split("</script>")[0])
    s = d["sequences"][0]
    assert len(s["signals"]) == 6 and len(s["signals"][0]) == 40
    assert s["probs"][1] == 0.9 and s["labels"][1] == 1


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw_inspect")
    spec = synthetic.VolumeSpec(n_beams=4, n_scans=8, n_samples=64, seed=7)
    synthetic.write_json_volume(str(d / "v.json"), spec)
    return str(d)


def test_inspect_cli_bscan(raw_dir, tmp_path):
    out = str(tmp_path / "bscan.html")
    cli.main(["inspect", "--data", raw_dir, "--mode", "bscan",
              "--size", "48", "--out", out])
    page = open(out).read()
    d = json.loads(page.split('id="data">')[1].split("</script>")[0])
    assert d["sequences"][0]["name"] == "v"
    assert len(d["sequences"][0]["frames"]) == 8


def test_inspect_cli_signal(raw_dir, tmp_path):
    out = str(tmp_path / "sig.html")
    cli.main(["inspect", "--data", raw_dir, "--mode", "signal",
              "--out", out])
    d = json.loads(open(out).read().split('id="data">')[1].split("</script>")[0])
    names = [s["name"] for s in d["sequences"]]
    assert len(names) == 4 and names[0].startswith("v/")
    assert all(len(s["signals"][0]) == 64 for s in d["sequences"])
