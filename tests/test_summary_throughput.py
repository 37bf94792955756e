import json

import jax
import jax.numpy as jnp
import numpy as np

from pautdx.data.summary import depth_limits_from_name, summarize_collection
from pautdx.serve.throughput import make_streaming_forward, measure_fps


def test_depth_limits_regex():
    assert depth_limits_from_name("file_D2.5-10.txt") == (2.5, 10.0)
    assert depth_limits_from_name("plain_name") is None


def test_summarize_collection(json_volume_dir, tmp_path):
    out = str(tmp_path / "summary.json")
    s = summarize_collection(json_volume_dir, out)
    assert "vol0" in s
    assert s["vol0"]["n_beams"] == 6
    assert s["vol0"]["n_scans"] == 80
    assert s["vol0"]["n_defect_scans"] > 0
    assert json.load(open(out))["vol1"]["scan_index_range"] == [0, 79]


def test_streaming_forward_scan():
    def apply_fn(images):
        s = images.mean(axis=(1, 2, 3))
        logits = jnp.stack([s, -s], -1)[:, None, :]
        boxes = jnp.zeros(images.shape[:1] + (1, 4))
        return logits, boxes

    stream = make_streaming_forward(apply_fn)
    slab = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 2, 8, 8, 3)).astype(np.float32))
    logits, boxes, carry = stream(slab, jnp.zeros((), jnp.float32))
    assert logits.shape == (2, 1, 2)
    assert np.isfinite(float(carry))
    fps = measure_fps(stream, slab, n_calls=2)
    assert fps > 0
