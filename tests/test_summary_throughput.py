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


def test_raw_uint8_stem_fold_equivalence():
    """fold_uint8_stem + raw_uint8 streaming == dequantize-first serving.

    The raw-uint8 path moves 1-byte patches through the s2d stem and
    folds the 1/255 into the stem kernel (`fold_uint8_stem`); outputs
    must match the explicit-dequant path to f32 rounding on the real
    D-FINE nano graph (tiny input so CPU compile stays fast).
    """
    import dataclasses

    from pautdx.models.vision.dfine import DFine, dfine_nano
    from pautdx.serve.throughput import fold_uint8_stem

    cfg = dataclasses.replace(dfine_nano(num_labels=2),
                              decoder_method="discrete")
    model = DFine(cfg)
    img = 64
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, img, img, 3)), train=False)

    def apply_fn_vars(v):
        def apply_fn(images):
            out = model.apply(v, images, train=False)
            return out["logits"], out["pred_boxes"]
        return apply_fn

    u8 = np.random.default_rng(2).integers(0, 256, (2, 1, img, img, 3),
                                           dtype=np.uint8)
    # dequantize-first reference (f32 to isolate the fold from bf16 noise)
    def deq_apply(images):
        out = model.apply(variables, images, train=False)
        return out["logits"], out["pred_boxes"]
    ref_stream = make_streaming_forward(lambda x: deq_apply(
        x.astype(jnp.float32)))
    lr, br, _ = ref_stream(jnp.asarray(u8.astype(np.float32) / 255.0),
                           jnp.zeros((), jnp.float32))

    folded = fold_uint8_stem(variables)
    raw_stream = make_streaming_forward(apply_fn_vars(folded),
                                        raw_uint8=True)
    lu, bu, carry = raw_stream(jnp.asarray(u8), jnp.zeros((), jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(lu, np.float32),
                               np.asarray(lr, np.float32),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(bu, np.float32),
                               np.asarray(br, np.float32),
                               rtol=2e-3, atol=2e-3)
    assert np.isfinite(float(carry))
    # conv-stem configs cannot consume uint8: loud error, not silence
    import pytest
    cfg_conv = dfine_nano(num_labels=2, tpu_stem=False, stride8_stem=False)
    v_conv = DFine(cfg_conv).init({"params": jax.random.PRNGKey(1)},
                                  jnp.zeros((1, img, img, 3)), train=False)
    with pytest.raises(KeyError, match="space-to-depth"):
        fold_uint8_stem(v_conv)


def test_stem_u8_materialize_is_identity():
    """`stem_u8_materialize` (round-5 relayout lever, tools/perf_r5.py)
    only inserts an optimization_barrier after the u8->bf16 cast — the
    raw-uint8 serving outputs must be BIT-identical with and without it,
    so the BENCH_ACCURACY raw-uint8 quality entry covers both."""
    import dataclasses

    from pautdx.models.vision.dfine import DFine, dfine_nano
    from pautdx.serve.throughput import fold_uint8_stem

    img = 64
    cfg = dataclasses.replace(dfine_nano(num_labels=2),
                              decoder_method="discrete")
    cfg_mat = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone,
                                          stem_u8_materialize=True))
    variables = DFine(cfg).init({"params": jax.random.PRNGKey(0)},
                                jnp.zeros((1, img, img, 3)), train=False)
    folded = fold_uint8_stem(variables)
    u8 = jnp.asarray(np.random.default_rng(3).integers(
        0, 256, (1, img, img, 3), dtype=np.uint8))
    out_a = DFine(cfg).apply(folded, u8, train=False)
    out_b = DFine(cfg_mat).apply(folded, u8, train=False)
    np.testing.assert_array_equal(np.asarray(out_a["logits"]),
                                  np.asarray(out_b["logits"]))
    np.testing.assert_array_equal(np.asarray(out_a["pred_boxes"]),
                                  np.asarray(out_b["pred_boxes"]))
