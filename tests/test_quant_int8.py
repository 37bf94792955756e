"""Activation-int8 serving path (ops/qconv.py + serve/quantize.py).

The reference never quantizes (its int8 story is ONNX-Runtime export
knobs, SURVEY.md §0); accuracy here is gated against OUR dense outputs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pautdx.models.vision.dfine import DFine, DFineConfig
from pautdx.models.vision.hgnet import ConvLayer, HGNetConfig
from pautdx.ops.qconv import int8_conv
from pautdx.serve.quantize import (
    calibrate_int8, drop_quant_sites, make_int8_apply, scales_from_calib,
)


def _tiny_dfine():
    return DFineConfig(
        num_labels=2, d_model=32, encoder_hidden_dim=32, decoder_layers=2,
        decoder_attention_heads=4, encoder_attention_heads=4,
        decoder_ffn_dim=64, encoder_ffn_dim=64, num_queries=20,
        max_num_bins=16, hidden_expansion=0.5,
        backbone=HGNetConfig(
            stem_channels=(3, 8, 8), stage_in_channels=(8, 16, 32, 64),
            stage_mid_channels=(8, 8, 16, 32),
            stage_out_channels=(16, 32, 64, 128),
            stage_num_blocks=(1, 1, 1, 1), stage_num_layers=(1, 1, 2, 2),
        ),
    )


def test_int8_conv_exact_on_representable_inputs():
    """When input and kernel are exactly representable at their scales,
    the int8 path's integer accumulation is EXACT — any residual
    difference vs the f32 conv is the f32 conv's own accumulation-order
    rounding (observed ~4e-6 relative), not quantization error."""
    rng = np.random.default_rng(0)
    s_in = 0.5
    x = (rng.integers(-100, 100, (2, 8, 8, 4)) * s_in).astype(np.float32)
    # per-channel absmax 3.0 -> w_scale 3/127; multiples of it are exact
    k = (rng.integers(-127, 128, (3, 3, 4, 8)) * (3.0 / 127.0)
         ).astype(np.float32)
    k[0, 0, 0, :] = 3.0   # pin the absmax so every channel scales the same
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = int8_conv(jnp.asarray(x), jnp.asarray(k), strides=(1, 1),
                    padding=((1, 1), (1, 1)), groups=1,
                    in_scale=jnp.float32(s_in))
    err = np.abs(np.asarray(got) - np.asarray(ref))
    tol = 1e-5 * np.abs(np.asarray(ref)) + 1e-4
    assert (err <= tol).all(), f"max err {err.max()} beyond f32 rounding"


def test_int8_conv_depthwise_and_stride():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    k = rng.normal(size=(3, 3, 1, 8)).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (2, 2), ((1, 1), (1, 1)),
        feature_group_count=8, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = int8_conv(jnp.asarray(x), jnp.asarray(k), strides=(2, 2),
                    padding=((1, 1), (1, 1)), groups=8,
                    in_scale=jnp.float32(float(np.abs(x).max()) / 127.0))
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    scale = np.abs(np.asarray(ref)).max()
    assert err <= 0.05 * scale, f"depthwise int8 error {err} vs {scale}"


def test_convlayer_calibrate_then_int8_close():
    rng = np.random.default_rng(2)
    layer = ConvLayer(features=16, kernel=3)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 8)).astype(np.float32))
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x)
    assert "calib" not in variables and "quant" not in variables

    _, mut = layer.apply(variables, x, mutable=["calib"])
    quant = scales_from_calib(dict(mut)["calib"])
    assert "in_scale" in quant, f"unexpected quant structure: {quant}"
    dense = layer.apply(variables, x)
    q = layer.apply({**variables, "quant": quant}, x)
    err = np.abs(np.asarray(q) - np.asarray(dense)).max()
    assert err <= 0.08 * float(np.abs(np.asarray(dense)).max() + 1e-6), err


def test_dfine_int8_serving_close_and_prunable():
    cfg = dataclasses.replace(_tiny_dfine(), decoder_method="discrete")
    model = DFine(cfg)
    img = 64
    rng = np.random.default_rng(3)
    images = jnp.asarray(
        rng.uniform(0, 1, (2, img, img, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           images[:1], train=False)

    def apply_calib(batch):
        return model.apply(variables, batch, train=False,
                           mutable=["calib"])

    quant = calibrate_int8(apply_calib, [images[:1], images[1:]])
    sites = [p for p, _ in
             jax.tree_util.tree_flatten_with_path(quant)[0]]
    # every backbone ConvLayer + neck ConvNorm site got a scale
    assert len(sites) >= 20, f"only {len(sites)} calibrated sites"

    # compare where int8 acts (backbone features): the final boxes of a
    # RANDOM-init model are chaotic wrt 1%-level perturbations (top-k
    # query selection over near-tied logits is discontinuous), so the
    # end-metric check lives in bench_accuracy on TRAINED weights
    filt = (lambda mod, method: type(mod).__name__ == "HGNetV2")
    dense, st_d = model.apply(variables, images, train=False,
                              capture_intermediates=filt)
    q, st_q = model.apply({**variables, "quant": quant}, images,
                          train=False, capture_intermediates=filt)
    ld = jax.tree_util.tree_leaves(st_d["intermediates"])
    lq = jax.tree_util.tree_leaves(st_q["intermediates"])
    assert len(ld) == len(lq) and len(ld) >= 3, len(ld)
    for a, b in zip(ld, lq):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = float(np.dot(a, b)
                    / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos >= 0.995, f"int8 backbone features diverged: cos={cos}"
    assert np.isfinite(np.asarray(q["logits"], np.float32)).all()
    assert np.isfinite(np.asarray(q["pred_boxes"], np.float32)).all()

    # pruning every site leaves an empty collection -> exact dense graph
    assert drop_quant_sites(quant, lambda path: False) == {}

    # pruning to backbone-only keeps a strict subset of sites and runs
    bb = drop_quant_sites(
        quant, lambda path: path.startswith("model.backbone"))
    n_bb = len(jax.tree_util.tree_leaves(bb))
    assert 0 < n_bb < len(sites)
    q_bb = model.apply({**variables, "quant": bb}, images, train=False)
    assert np.isfinite(np.asarray(q_bb["logits"], np.float32)).all()


def test_yolo_int8_features_close():
    """ConvBnSiLU (the YOLO family's only conv block) takes the int8
    path when calibrated; detector head outputs stay close (dense graph
    is conv-heavy end to end, no discontinuous selection like D-FINE's
    top-k, so the final maps are directly comparable)."""
    from pautdx.models.vision import YOLO, YoloConfig

    cfg = YoloConfig(num_classes=2, scale="n", flavour="v8")
    model = YOLO(cfg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False)
    apply_fn, quant = make_int8_apply(model, variables, [x])
    n_sites = len(jax.tree_util.tree_leaves(quant))
    assert n_sites >= 30, f"only {n_sites} calibrated YOLO conv sites"
    dense = model.apply(variables, x, train=False)
    q = apply_fn(x)
    # cosine over ALL anchors of all levels: the P5 level alone is tiny
    # (4x4 cells here) and random-init logits there are near-zero, so a
    # per-level cosine is sample-noise, not a quantization measurement.
    # Trained-weight quality is gated by the accuracy harness.
    for k in ("box", "cls"):
        a = np.concatenate([np.asarray(l[k], np.float32).ravel()
                            for l in dense["levels"]])
        b = np.concatenate([np.asarray(l[k], np.float32).ravel()
                            for l in q["levels"]])
        cos = float(np.dot(a, b)
                    / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos >= 0.97, f"yolo int8 {k} diverged: cos={cos}"


def test_make_int8_apply_wrapper():
    """One-call serving helper: calibrates, merges, runs."""
    rng = np.random.default_rng(4)
    layer = ConvLayer(features=8, kernel=3)
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 4)).astype(np.float32))
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x)
    apply_fn, quant = make_int8_apply(layer, variables, [x])
    assert "in_scale" in quant
    dense = layer.apply(variables, x)
    got = apply_fn(x)
    err = np.abs(np.asarray(got) - np.asarray(dense)).max()
    assert err <= 0.08 * float(np.abs(np.asarray(dense)).max() + 1e-6)
    # drop predicate prunes to the dense graph
    apply_all_dense, q2 = make_int8_apply(layer, variables, [x],
                                          drop=lambda p: False)
    assert q2 == {}
    np.testing.assert_array_equal(np.asarray(apply_all_dense(x)),
                                  np.asarray(dense))


def test_quant_collection_never_created_at_init():
    """init() must not bake calib/quant into fresh variables, and a
    stray quant collection at init time is ignored: the dense branch
    creates the params normally (quant only affects apply)."""
    layer = ConvLayer(features=4, kernel=3)
    x = jnp.zeros((1, 8, 8, 4))
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x)
    assert set(variables.keys()) == {"params", "batch_stats"}
    out, mut = layer.apply({"quant": {"in_scale": jnp.float32(0.1)}}, x,
                           rngs={"params": jax.random.PRNGKey(0)},
                           mutable=["params", "batch_stats"])
    got = jax.tree_util.tree_map(
        np.asarray, dict(mut)["params"]["convolution"])
    want = jax.tree_util.tree_map(
        np.asarray, dict(variables)["params"]["convolution"])
    np.testing.assert_array_equal(got["kernel"], want["kernel"])
    assert np.isfinite(np.asarray(out)).all()
