"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pautdx.ops.nms import nms
from pautdx.ops.pallas_nms import pallas_nms


def _random_boxes(n, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, 30, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], 1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    classes = rng.integers(0, 3, n).astype(np.int32)
    return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes)


def test_pallas_nms_matches_xla_nms():
    boxes, scores, classes = _random_boxes(64)
    kw = dict(iou_threshold=0.5, score_threshold=0.1, top_k=64, max_det=32)
    a = nms(boxes, scores, classes, **kw)
    b = pallas_nms(boxes, scores, classes, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(a["valid"]), np.asarray(b["valid"]))
    keep = np.asarray(a["valid"])
    np.testing.assert_allclose(np.asarray(a["scores"])[keep],
                               np.asarray(b["scores"])[keep])
    np.testing.assert_allclose(np.asarray(a["boxes"])[keep],
                               np.asarray(b["boxes"])[keep])
    np.testing.assert_array_equal(np.asarray(a["classes"])[keep],
                                  np.asarray(b["classes"])[keep])


def test_pallas_nms_suppression_basic():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                        jnp.float32)
    scores = jnp.asarray([0.9, 0.85, 0.7])
    classes = jnp.zeros(3, jnp.int32)
    out = pallas_nms(boxes, scores, classes, iou_threshold=0.5, top_k=3,
                     max_det=3, interpret=True)
    assert int(out["valid"].sum()) == 2


def test_pallas_mask_decode_matches_xla():
    from pautdx.models.vision.yolo import assemble_masks
    from pautdx.ops.pallas_mask import pallas_assemble_masks

    rng = np.random.default_rng(3)
    B, Hp, Wp, P, K = 2, 32, 32, 8, 5
    protos = jnp.asarray(rng.normal(size=(B, Hp, Wp, P)), jnp.float32)
    coeffs = jnp.asarray(rng.normal(size=(B, K, P)), jnp.float32)
    img = (128, 128)
    xy = rng.uniform(0, 100, (B, K, 2))
    wh = rng.uniform(10, 28, (B, K, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)

    want = assemble_masks(protos, coeffs, boxes, img)
    got = pallas_assemble_masks(protos, coeffs, boxes, img, interpret=True)
    assert got.shape == (B, K, Hp, Wp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_mask_decode_uneven_tile():
    from pautdx.models.vision.yolo import assemble_masks
    from pautdx.ops.pallas_mask import pallas_assemble_masks

    rng = np.random.default_rng(4)
    B, Hp, Wp, P, K = 1, 24, 16, 4, 3          # Hp % 16 != 0 -> tile fallback
    protos = jnp.asarray(rng.normal(size=(B, Hp, Wp, P)), jnp.float32)
    coeffs = jnp.asarray(rng.normal(size=(B, K, P)), jnp.float32)
    boxes = jnp.asarray([[[0, 0, 40, 40], [10, 20, 50, 60], [0, 0, 64, 96]]],
                        jnp.float32)
    want = assemble_masks(protos, coeffs, boxes, (96, 64))
    got = pallas_assemble_masks(protos, coeffs, boxes, (96, 64),
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_onehot_gather_matches_indexing():
    from pautdx.ops.pallas_gather import pallas_onehot_gather

    rng = np.random.default_rng(5)
    B, L, C, T = 2, 40, 16, 24
    flat = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, L, (B, T)), jnp.int32)
    got = pallas_onehot_gather(flat, idx, 0, True)
    want = jnp.take_along_axis(flat, idx[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_onehot_gather_grad():
    from pautdx.ops.pallas_gather import pallas_onehot_gather

    rng = np.random.default_rng(6)
    B, L, C, T = 1, 10, 4, 6
    flat = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    idx = jnp.asarray([[0, 3, 3, 9, 1, 0]], jnp.int32)

    def f(v):
        return jnp.sum(pallas_onehot_gather(v, idx, 0, True) ** 2)

    g = jax.grad(f)(flat)
    want = jax.grad(
        lambda v: jnp.sum(jnp.take_along_axis(
            v, idx[..., None], axis=1) ** 2))(flat)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=1e-6)


def test_deformable_discrete_unaffected_on_cpu():
    """CPU path must keep the XLA gather (pallas auto-dispatch is TPU-only)."""
    from pautdx.ops.deformable import ms_deformable_attention_shared

    rng = np.random.default_rng(7)
    B, Q, h, d = 1, 4, 2, 4
    levels = [jnp.asarray(rng.normal(size=(B, 8, 8, h, d)), jnp.float32),
              jnp.asarray(rng.normal(size=(B, 4, 4, h, d)), jnp.float32)]
    loc = jnp.asarray(rng.uniform(0, 1, (B, Q, 8, 2)), jnp.float32)
    w = jax.nn.softmax(jnp.asarray(rng.normal(size=(B, Q, h, 8)), jnp.float32))
    out = ms_deformable_attention_shared(levels, loc, w, [4, 4],
                                         method="discrete")
    assert out.shape == (B, Q, h * d)
    assert np.isfinite(np.asarray(out)).all()


def test_pallas_weighted_gather_matches_manual():
    from pautdx.ops.pallas_gather import pallas_weighted_gather

    rng = np.random.default_rng(8)
    B, L, C, T, K = 2, 30, 8, 12, 4
    flat = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, L, (B, T, K)), jnp.int32)
    w = jnp.asarray(rng.uniform(0, 1, (B, T, K)), jnp.float32)
    got = pallas_weighted_gather(flat, idx, w, 0, True)
    rows = jnp.take_along_axis(flat, idx.reshape(B, T * K)[..., None],
                               axis=1).reshape(B, T, K, C)
    want = jnp.sum(rows * w[..., None], axis=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_weighted_gather_grads():
    from pautdx.ops.pallas_gather import pallas_weighted_gather

    rng = np.random.default_rng(9)
    B, L, C, T, K = 1, 10, 4, 6, 4
    flat = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, L, (B, T, K)), jnp.int32)
    w = jnp.asarray(rng.uniform(0, 1, (B, T, K)), jnp.float32)

    def manual(flat, w):
        rows = jnp.take_along_axis(flat, idx.reshape(B, T * K)[..., None],
                                   axis=1).reshape(B, T, K, C)
        return jnp.sum(jnp.sum(rows * w[..., None], axis=2) ** 2)

    def kern(flat, w):
        return jnp.sum(pallas_weighted_gather(flat, idx, w, 0, True) ** 2)

    gf_m, gw_m = jax.grad(manual, argnums=(0, 1))(flat, w)
    gf_k, gw_k = jax.grad(kern, argnums=(0, 1))(flat, w)
    np.testing.assert_allclose(np.asarray(gf_k), np.asarray(gf_m), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_m), rtol=1e-5)


def test_deformable_shared_bilinear_pallas_matches_xla():
    """The sparse-weight-matmul bilinear path == the 2x2-window XLA path."""
    import pautdx.ops.deformable as dfm
    from pautdx.ops.pallas_gather import pallas_weighted_gather

    rng = np.random.default_rng(10)
    B, Q, h, d = 2, 5, 2, 4
    levels = [jnp.asarray(rng.normal(size=(B, 8, 8, h, d)), jnp.float32),
              jnp.asarray(rng.normal(size=(B, 4, 4, h, d)), jnp.float32)]
    # include out-of-range locations to exercise zeros-padding semantics
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (B, Q, 8, 2)), jnp.float32)
    w = jax.nn.softmax(jnp.asarray(rng.normal(size=(B, Q, h, 8)), jnp.float32))

    want = dfm.ms_deformable_attention_shared(levels, loc, w, [4, 4])

    # force the pallas branch (interpret mode) by faking the tpu check
    real_backend = dfm.jax.default_backend
    orig = pallas_weighted_gather
    try:
        dfm.jax.default_backend = lambda: "tpu"
        import pautdx.ops.pallas_gather as pg
        real_impl = pg._weighted_impl
        pg._weighted_impl = lambda f, i, w_, t, interp: real_impl(
            f, i, w_, t, True)
        got = dfm.ms_deformable_attention_shared(levels, loc, w, [4, 4])
    finally:
        dfm.jax.default_backend = real_backend
        pg._weighted_impl = real_impl
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def _einsum_attention(q, k, v, h):
    # the TorchMHA einsum chain (q pre-scaled), reference for the kernel
    def split(t):
        return t.reshape(t.shape[:-1] + (h, t.shape[-1] // h))
    w = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k)),
                       axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, split(v))
    return out.reshape(out.shape[:-2] + (q.shape[-1],))


def test_pallas_aifi_attention_matches_einsum():
    from pautdx.ops.pallas_attention import aifi_attention

    rng = np.random.default_rng(0)
    B, N, D, h = 2, 40, 64, 4
    q, k, v = (jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
               for _ in range(3))
    ref = _einsum_attention(q, k, v, h)
    got = aifi_attention(q, k, v, num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # serving dtype: kernel accumulates scores in f32 where the einsum
    # path stores bf16 scores -> small tolerance, same argmax structure
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    ref16 = _einsum_attention(qb, kb, vb, h)
    got16 = aifi_attention(qb, kb, vb, num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(got16, np.float32),
                               np.asarray(ref16, np.float32),
                               rtol=0.05, atol=0.05)


def test_dfine_encoder_fused_attn_equivalence():
    """DFine with encoder_fused_attn must match the einsum encoder at
    serving tolerance (bf16-level deltas), and training mode must keep
    the einsum path (the kernel is inference-only)."""
    import dataclasses

    from pautdx.models.vision.dfine import DFine, dfine_nano

    img = 64
    cfg = dataclasses.replace(dfine_nano(num_labels=2),
                              decoder_method="discrete")
    cfg_f = dataclasses.replace(cfg, encoder_fused_attn=True)
    variables = DFine(cfg).init({"params": jax.random.PRNGKey(0)},
                                jnp.zeros((1, img, img, 3)), train=False)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, img, img, 3)).astype(np.float32))
    a = DFine(cfg).apply(variables, x, train=False)
    b = DFine(cfg_f).apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(b["logits"], np.float32),
                               np.asarray(a["logits"], np.float32),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(b["pred_boxes"], np.float32),
                               np.asarray(a["pred_boxes"], np.float32),
                               rtol=2e-3, atol=2e-3)
