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


def test_streaming_forward_uint8_wire():
    """uint8 slabs dequantize on device: same results as pre-scaled f32."""
    seen = []

    def apply_fn(images):
        seen.append(images.dtype)
        s = images.astype(jnp.float32).mean(axis=(1, 2, 3))
        logits = jnp.stack([s, -s], -1)[:, None, :]
        boxes = jnp.zeros(images.shape[:1] + (1, 4))
        return logits, boxes

    stream = make_streaming_forward(apply_fn)
    u8 = np.random.default_rng(1).integers(0, 256, (3, 2, 8, 8, 3),
                                           dtype=np.uint8)
    logits_u8, _, carry = stream(jnp.asarray(u8), jnp.zeros((), jnp.bfloat16))
    f32 = jnp.asarray((u8.astype(np.float32) / 255.0).astype(jnp.bfloat16),
                      jnp.float32)
    logits_f32, _, _ = stream(jnp.asarray(f32), jnp.zeros((), jnp.float32))
    assert seen[0] == jnp.bfloat16        # dequantized before apply_fn
    np.testing.assert_allclose(np.asarray(logits_u8),
                               np.asarray(logits_f32), rtol=2e-2, atol=2e-2)
    assert measure_fps(stream, jnp.asarray(u8), n_calls=1) > 0
