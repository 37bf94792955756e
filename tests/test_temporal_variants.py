"""TemporalDFine v1/v2/v3 semantics: distinct param trees, per-variant
trainability (reference freeze/unfreeze contracts), trunk-head seeding,
and selective-update training for v2.

Reference contracts: v1 trains only the temporal encoder
(`temporal_dfine.py:133-139`); v2 re-initializes a defect classifier with
label-count-mismatch semantics and unfreezes exactly temporal encoder +
class head (`temp_dfine_over.py:126-285`); v3 trains everything except
the trunk backbone and adds attention-pool/BiGRU-context/anomaly modules
(`temp_dfine_over_improved.py:126-353`).
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from pautdx.models.vision.temporal_dfine import (
    TemporalDFine, init_heads_from_trunk, temporal_consistency_loss,
    trainable_mask,
)
from tests.test_dfine_train import TINY

IMG = 64
T = 2
DEFECTS = 3      # temporal labels = 4 != TINY.num_labels (2) -> fresh head


def _init(variant):
    num_t = None if variant == "v1" else DEFECTS + 1
    model = TemporalDFine(TINY, variant=variant, num_temporal_labels=num_t,
                          num_temporal_layers=1, temporal_heads=4)
    x = jnp.zeros((T, IMG, IMG, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return model, variables


def test_variants_have_distinct_param_trees():
    trees = {}
    for v in ("v1", "v2", "v3"):
        _, variables = _init(v)
        trees[v] = set(variables["params"].keys())
    # v3 adds attention pool, context aggregator/projector, anomaly MLP
    extra = trees["v3"] - trees["v2"]
    assert {"temporal_attention.0", "temporal_attention.2",
            "context_aggregator", "context_projector",
            "anomaly_detector.0", "anomaly_detector.2",
            "anomaly_detector.4"} <= extra
    # v2's class head is re-shaped for defects+1 labels, v1 keeps trunk's
    _, v1_vars = _init("v1")
    _, v2_vars = _init("v2")
    assert v1_vars["params"]["class_head"]["kernel"].shape[-1] == \
        TINY.num_labels
    assert v2_vars["params"]["class_head"]["kernel"].shape[-1] == DEFECTS + 1


def test_trainable_masks_match_reference_freeze_contracts():
    for variant, expect_true, expect_false in (
        ("v1", ["temporal_encoder"], ["class_head", "bbox_head", "trunk"]),
        ("v2", ["temporal_encoder", "class_head"], ["bbox_head", "trunk"]),
        ("v3", ["temporal_encoder", "class_head", "bbox_head",
                "anomaly_detector.0"], []),
    ):
        _, variables = _init(variant)
        mask = trainable_mask(variant, variables["params"])
        flat = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(mask)[0]:
            keys = [getattr(p, "key", str(p)) for p in path]
            flat.setdefault(keys[0], set()).add(leaf)
        for top in expect_true:
            assert flat[top] == {True}, (variant, top)
        for top in expect_false:
            assert flat[top] == {False}, (variant, top)
    # v3: trunk backbone frozen, trunk decoder/encoder trainable
    _, variables = _init("v3")
    mask = trainable_mask("v3", variables["params"])
    trunk = mask["trunk"]
    backbone_leaves = set(jax.tree_util.tree_leaves(
        trunk["model.backbone.model"]))
    assert backbone_leaves == {False}
    rest = {k: v for k, v in trunk.items() if k != "model.backbone.model"}
    assert set(jax.tree_util.tree_leaves(rest)) == {True}


def test_init_heads_from_trunk_seeding():
    # v1: both heads copied from the trunk's final heads
    _, variables = _init("v1")
    seeded = init_heads_from_trunk(variables, "v1")
    trunk = seeded["params"]["trunk"]
    last = max(int(k.rsplit(".", 1)[1]) for k in trunk
               if k.startswith("class_embed."))
    np.testing.assert_array_equal(
        seeded["params"]["class_head"]["kernel"],
        trunk[f"class_embed.{last}"]["kernel"])
    for layer in ("layers.0", "layers.1", "layers.2"):
        np.testing.assert_array_equal(
            seeded["params"]["bbox_head"][layer]["kernel"],
            trunk[f"bbox_embed.{last}"][layer]["kernel"])
    # temporal encoder kernels are tiny-initialized (reference std 1e-3)
    for leaf in jax.tree_util.tree_leaves(
            seeded["params"]["temporal_encoder"]):
        if leaf.ndim >= 2:
            assert float(np.std(np.asarray(leaf))) < 2e-3
    # v2: class head widths differ -> stays fresh; bbox head still copied
    _, v2_vars = _init("v2")
    before = np.asarray(v2_vars["params"]["class_head"]["kernel"]).copy()
    seeded = init_heads_from_trunk(v2_vars, "v2")
    np.testing.assert_array_equal(
        np.asarray(seeded["params"]["class_head"]["kernel"]), before)
    np.testing.assert_array_equal(
        seeded["params"]["bbox_head"]["layers.2"]["kernel"],
        seeded["params"]["trunk"][f"bbox_embed.{last}"]["layers.2"]["kernel"])


def test_v2_selective_training_updates_only_unfrozen():
    from pautdx.losses.detr import dfine_criterion

    model, variables = _init("v2")
    variables = init_heads_from_trunk(variables, "v2")
    params, bstats = variables["params"], variables["batch_stats"]
    mask = trainable_mask("v2", params)
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(
            {True: optax.adam(1e-3), False: optax.set_to_zero()}, mask))
    opt_state = opt.init(params)

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(T, IMG, IMG, 3)), jnp.float32)
    gt_boxes = jnp.asarray([[[0.4, 0.4, 0.2, 0.2]]] * T, jnp.float32)
    gt_classes = jnp.zeros((T, 1), jnp.int32)
    gt_mask = jnp.ones((T, 1), jnp.float32)

    def loss_fn(p):
        out = model.apply({"params": p, "batch_stats": bstats}, x,
                          train=True,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        head_out = {
            "intermediate_logits": [out["logits"]],
            "intermediate_boxes": [out["pred_boxes"]],
            "intermediate_corners": [],
            "initial_references": [],
        }
        loss, _ = dfine_criterion(head_out, gt_boxes, gt_classes, gt_mask,
                                  model.head_labels, TINY.max_num_bins)
        return loss

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    p0 = jax.device_get(params)
    params_new = params
    for _ in range(2):
        params_new, opt_state, loss = step(params_new, opt_state)
    assert np.isfinite(float(loss))
    p1 = jax.device_get(params_new)

    def changed(a, b):
        return any(not np.allclose(x, y) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    assert changed(p0["temporal_encoder"], p1["temporal_encoder"])
    assert changed(p0["class_head"], p1["class_head"])
    assert not changed(p0["trunk"], p1["trunk"])
    assert not changed(p0["bbox_head"], p1["bbox_head"])


def test_v3_anomaly_per_defect_class_and_consistency():
    model, variables = _init("v3")
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(T, IMG, IMG, 3)), jnp.float32)
    out = model.apply(variables, x, train=False)
    Q = TINY.num_queries
    assert out["anomaly"].shape == (T, Q, DEFECTS)
    assert out["logits"].shape == (T, Q, DEFECTS + 1)
    loss = temporal_consistency_loss(out["anomaly"])
    assert np.isfinite(float(loss))
