"""Contrastive denoising groups: static shapes, mask structure, training
integration with the D-FINE criterion + denoising loss."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from pautdx.losses.denoising import (
    denoising_group_size, denoising_loss, make_denoising_queries,
)
from pautdx.losses.detr import dfine_criterion
from pautdx.models.vision.dfine import DFine
from tests.test_dfine_train import TINY

IMG = 64
M = 2


@pytest.fixture(scope="module")
def gts():
    gt_boxes = jnp.asarray(np.tile(
        np.asarray([[[0.4, 0.4, 0.2, 0.2], [0.65, 0.6, 0.15, 0.2]]],
                   np.float32), (2, 1, 1)))
    gt_classes = jnp.asarray([[0, 1], [1, 0]], jnp.int32)
    gt_mask = jnp.asarray([[1.0, 1.0], [1.0, 0.0]])
    return gt_boxes, gt_classes, gt_mask


def test_group_layout_and_mask(gts):
    gt_boxes, gt_classes, gt_mask = gts
    groups, D = denoising_group_size(M, num_denoising=8)
    assert groups == 4 and D == 2 * M * groups
    dn = make_denoising_queries(jax.random.PRNGKey(0), gt_boxes, gt_classes,
                                gt_mask, TINY.num_labels, TINY.num_queries,
                                num_denoising=8)
    assert dn["class_ids"].shape == (2, D)
    assert dn["box_logits"].shape == (2, D, 4)
    L = D + TINY.num_queries
    assert dn["attn_mask"].shape == (L, L)
    m = np.asarray(dn["attn_mask"])
    # matching queries blocked from denoising block
    assert (m[D:, :D] < -1e8).all()
    # within-group visible, cross-group blocked
    assert m[0, 1] == 0.0
    assert m[0, 2 * M] < -1e8
    # padded GT slot (batch 1, slot 1) is never positive
    ispos = np.asarray(dn["is_positive"])
    assert not ispos[1][np.asarray(dn["gt_index"])[1] == 1].any()
    # padded slots use the padding class id
    cids = np.asarray(dn["class_ids"])
    assert (cids[1][np.asarray(dn["gt_index"])[1] == 1] == TINY.num_labels).all()


def test_denoising_training_step(gts):
    gt_boxes, gt_classes, gt_mask = gts
    model = DFine(TINY)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, IMG, IMG, 3)).astype(np.float32))
    dn = make_denoising_queries(jax.random.PRNGKey(0), gt_boxes, gt_classes,
                                gt_mask, TINY.num_labels, TINY.num_queries,
                                num_denoising=8)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params, bs = variables["params"], variables["batch_stats"]
    opt = optax.adam(2e-4)
    opt_state = opt.init(params)

    def loss_fn(p, key):
        dn_k = make_denoising_queries(key, gt_boxes, gt_classes, gt_mask,
                                      TINY.num_labels, TINY.num_queries,
                                      num_denoising=8)
        out, mut = model.apply({"params": p, "batch_stats": bs}, x,
                               train=True, denoising=dn_k,
                               rngs={"dropout": jax.random.PRNGKey(1)},
                               mutable=["batch_stats"])
        main, _ = dfine_criterion(out, gt_boxes, gt_classes, gt_mask,
                                  TINY.num_labels, TINY.max_num_bins)
        dn_total = 0.0
        for lg, bx in zip(out["dn_logits"], out["dn_boxes"]):
            dnl, _ = denoising_loss(lg, bx, dn_k, gt_boxes, gt_classes)
            dn_total = dn_total + dnl
        return main + dn_total

    @jax.jit
    def step(p, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, key)
        updates, opt_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    losses = []
    key = jax.random.PRNGKey(10)   # fixed noise -> comparable losses
    for i in range(6):
        params, opt_state, loss = step(params, opt_state, key)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # eval path unchanged: no denoising arg, standard output shapes
    out = model.apply({"params": params, "batch_stats": bs}, x, train=False)
    assert out["logits"].shape == (2, TINY.num_queries, TINY.num_labels)
