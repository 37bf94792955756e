"""D-FINE criterion + temporal variants: matcher sanity, finite grads,
loss decreases, temporal forward shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pautdx.losses.detr import (
    box_cxcywh_to_xyxy, build_cost, dfine_criterion, giou_xyxy,
    hungarian_match,
)
from pautdx.models.vision.dfine import DFine, DFineConfig
from pautdx.models.vision.hgnet import HGNetConfig
from pautdx.models.vision.temporal_dfine import (
    TemporalDFine, temporal_consistency_loss,
)

IMG = 64

TINY = DFineConfig(
    num_labels=2, d_model=64, encoder_hidden_dim=64, decoder_layers=2,
    decoder_attention_heads=4, encoder_attention_heads=4,
    decoder_ffn_dim=128, encoder_ffn_dim=128, num_queries=20,
    max_num_bins=16, hidden_expansion=0.5,
    backbone=HGNetConfig(
        stem_channels=(3, 8, 8), stage_in_channels=(8, 16, 32, 64),
        stage_mid_channels=(8, 8, 16, 32), stage_out_channels=(16, 32, 64, 128),
        stage_num_blocks=(1, 1, 1, 1), stage_num_layers=(1, 1, 2, 2),
    ),
)


def test_giou_identity():
    b = jnp.asarray([[0.2, 0.2, 0.6, 0.6]])
    assert float(giou_xyxy(b, b)[0]) > 0.999


def test_hungarian_matches_obvious_assignment():
    # 1 batch, 3 queries, 2 gts: query2->gt0, query0->gt1 obviously cheapest
    cost = jnp.asarray([[[5.0, 0.1], [5.0, 5.0], [0.1, 5.0]]])
    match = np.asarray(hungarian_match(cost))
    assert match[0, 0] == 2 and match[0, 1] == 0


def test_cost_padded_columns_uniform():
    B, Q, M, C = 1, 4, 3, 2
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(B, Q, C)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0.2, 0.8, (B, Q, 4)).astype(np.float32))
    gt_boxes = jnp.asarray(rng.uniform(0.2, 0.8, (B, M, 4)).astype(np.float32))
    gt_classes = jnp.zeros((B, M), jnp.int32)
    gt_mask = jnp.asarray([[1.0, 1.0, 0.0]])
    cost = build_cost(logits, boxes, gt_boxes, gt_classes, gt_mask)
    # padded GT columns carry a UNIFORM cost (0) so the on-device solver's
    # float32 duals stay at real-cost scale; uniformity is what guarantees
    # real columns keep their optimal queries.
    pad_col = np.asarray(cost[0, :, 2])
    assert np.all(pad_col == pad_col[0])
    assert float(pad_col[0]) == 0.0


@pytest.fixture(scope="module")
def dfine_setup():
    model = DFine(TINY)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, IMG, IMG, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    gt_boxes = jnp.asarray(np.tile(
        np.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.6, 0.15, 0.2]]],
                   np.float32), (2, 1, 1)))
    gt_classes = jnp.asarray([[0, 1], [0, 1]], jnp.int32)
    gt_mask = jnp.asarray([[1.0, 1.0], [1.0, 0.0]])
    return model, variables, x, (gt_boxes, gt_classes, gt_mask)


def test_ddf_self_distillation(dfine_setup):
    """GO-LSD: zero when student==teacher; positive otherwise; present in
    the criterion aux and contributing ddf_weight * ddf to the total."""
    from pautdx.losses.detr import _ddf_loss

    model, variables, x, (gt_boxes, gt_classes, gt_mask) = dfine_setup
    rng = np.random.default_rng(0)
    B, Q, nb = 2, 5, TINY.max_num_bins
    teacher = jnp.asarray(rng.normal(size=(B, Q, 4 * (nb + 1))), jnp.float32)
    w = jnp.ones((B, Q))
    mask = jnp.zeros((B, Q)).at[:, 0].set(1.0)
    z = _ddf_loss(teacher, teacher, w, mask, nb)
    assert abs(float(z)) < 1e-6
    student = teacher + 0.5
    # uniform shift is softmax-invariant -> still zero
    assert abs(float(_ddf_loss(student, teacher, w, mask, nb))) < 1e-5
    student = jnp.asarray(rng.normal(size=teacher.shape), jnp.float32)
    pos = float(_ddf_loss(student, teacher, w, mask, nb))
    assert pos > 0
    # gradient flows to the student only
    g = jax.grad(lambda s: _ddf_loss(s, teacher, w, mask, nb))(student)
    assert float(jnp.abs(g).sum()) > 0

    out = model.apply(variables, x, train=False)
    loss_with, aux = dfine_criterion(out, gt_boxes, gt_classes, gt_mask,
                                     TINY.num_labels, TINY.max_num_bins)
    loss_without, _ = dfine_criterion(out, gt_boxes, gt_classes, gt_mask,
                                      TINY.num_labels, TINY.max_num_bins,
                                      ddf_weight=0.0)
    assert "ddf" in aux and np.isfinite(float(aux["ddf"]))
    np.testing.assert_allclose(float(loss_with),
                               float(loss_without) + 1.5 * float(aux["ddf"]),
                               rtol=1e-5)


def test_dfine_criterion_finite_and_trains(dfine_setup):
    model, variables, x, (gt_boxes, gt_classes, gt_mask) = dfine_setup
    params = variables["params"]
    bs = variables["batch_stats"]
    opt = optax.adam(2e-4)
    opt_state = opt.init(params)

    def loss_fn(p):
        out, mut = model.apply({"params": p, "batch_stats": bs}, x,
                               train=True,
                               rngs={"dropout": jax.random.PRNGKey(0)},
                               mutable=["batch_stats"])
        loss, aux = dfine_criterion(out, gt_boxes, gt_classes, gt_mask,
                                    TINY.num_labels, TINY.max_num_bins)
        return loss, aux

    @jax.jit
    def step(p, opt_state):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, opt_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss, grads

    losses = []
    for _ in range(6):
        params, opt_state, loss, grads = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    gnorm = float(optax.global_norm(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # the (frozen-path-free) trunk gets gradients everywhere, incl. backbone
    bb = grads["model.backbone.model"]
    assert float(optax.global_norm(bb)) > 0


@pytest.mark.parametrize("variant", ["v1", "v2", "v3"])
def test_temporal_dfine_forward(variant):
    T = 3
    model = TemporalDFine(TINY, variant=variant, num_temporal_layers=1,
                          temporal_heads=4)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(T, IMG, IMG, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["logits"].shape == (T, TINY.num_queries, TINY.num_labels)
    assert out["pred_boxes"].shape == (T, TINY.num_queries, 4)
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    b = np.asarray(out["pred_boxes"])
    assert (b >= 0).all() and (b <= 1).all()
    if variant == "v3":
        # per-defect-class anomaly scores (num_temporal_labels=None here,
        # so defects = trunk labels - 1)
        assert out["anomaly"].shape == (T, TINY.num_queries,
                                        TINY.num_labels - 1)
        tc = temporal_consistency_loss(out["anomaly"])
        assert np.isfinite(float(tc))


def test_temporal_trunk_gradient_stopped():
    model = TemporalDFine(TINY, variant="v1", num_temporal_layers=1,
                          temporal_heads=4)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, IMG, IMG, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def loss_fn(p):
        out = model.apply({"params": p,
                           "batch_stats": variables["batch_stats"]}, x,
                          train=False)
        return jnp.sum(out["logits"] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    import optax
    assert float(optax.global_norm(grads["trunk"]["model.backbone.model"])) == 0.0
    assert float(optax.global_norm(grads["temporal_encoder"])) > 0.0
