"""Recipes + the 3-phase HybridModel freeze schedule via optimizer masks."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pautdx.models.signal import HybridModel
from pautdx.train.optim import label_params, make_optimizer
from pautdx.train.recipes import RECIPES, HybridPhases


def test_recipes_have_objectives():
    for name, r in RECIPES.items():
        assert callable(r.make_objective())


def test_label_params_groups():
    model = HybridModel(d_model=32, num_heads=2, norm="group")
    x = jnp.zeros((1, 4, 64))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    labels = label_params(variables["params"], HybridPhases.group_patterns())
    flat = jax.tree_util.tree_leaves(labels)
    assert "detection" in flat and "position" in flat


def test_phase_freezing_keeps_masked_params_fixed():
    model = HybridModel(d_model=32, num_heads=2, norm="group")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 4, 64)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params = variables["params"]

    phases = HybridPhases()
    det_mask, pos_mask, joint_mask = phases.phase_masks()
    # phase 1: position path frozen (lr mult 0)
    opt = make_optimizer(1e-2, group_lr_mults=det_mask,
                         group_patterns=HybridPhases.group_patterns(),
                         params=params)
    opt_state = opt.init(params)

    def loss_fn(p):
        out = model.apply({"params": p}, x, train=False)
        return jnp.mean(out["prob"]) + jnp.mean(out["positions"])

    grads = jax.grad(loss_fn)(params)
    updates, _ = opt.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    det_delta = optax.global_norm(jax.tree_util.tree_map(
        lambda a, b: a - b, new_params["detection"], params["detection"]))
    pos_delta = optax.global_norm(jax.tree_util.tree_map(
        lambda a, b: a - b, new_params["position_head"],
        params["position_head"]))
    assert float(det_delta) > 0.0
    assert float(pos_delta) == 0.0
