"""Round-5 harness hardening: the `legacy_vfl` diagnostic arm of the
criterion A/B (tools/criterion_ab.py) and the CPU-backend-safe JAX
forward used by `eval_torch_parity` (tools/bench_accuracy.py).

The legacy arm must reproduce the PRE-round-4 objective's gradient
structure — VFL quality target backprops into the box path, focal
weight into the scores — while the default (HF-faithful, matching
`ious.detach()` in transformers' D-FINE loss) detaches both. Reference
loss stack: /root/reference/D-Fine/temp_dfine_over.py:189-275.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pautdx.losses.detr import dfine_criterion
from pautdx.models.vision.dfine import DFine, DFineConfig
from pautdx.models.vision.hgnet import HGNetConfig

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")

IMG = 64

TINY = DFineConfig(
    num_labels=2, d_model=64, encoder_hidden_dim=64, decoder_layers=2,
    decoder_attention_heads=4, encoder_attention_heads=4,
    decoder_ffn_dim=128, encoder_ffn_dim=128, num_queries=20,
    max_num_bins=16, hidden_expansion=0.5,
    backbone=HGNetConfig(
        stem_channels=(3, 8, 8), stage_in_channels=(8, 16, 32, 64),
        stage_mid_channels=(8, 8, 16, 32),
        stage_out_channels=(16, 32, 64, 128),
        stage_num_blocks=(1, 1, 1, 1), stage_num_layers=(1, 1, 2, 2),
    ),
)


@pytest.fixture(scope="module")
def setup():
    model = DFine(TINY)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, IMG, IMG, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    gt_boxes = jnp.asarray(np.tile(
        np.asarray([[[0.3, 0.3, 0.4, 0.4], [0.7, 0.6, 0.3, 0.35]]],
                   np.float32), (2, 1, 1)))
    gt_classes = jnp.asarray([[0, 1], [0, 1]], jnp.int32)
    gt_mask = jnp.asarray([[1.0, 1.0], [1.0, 0.0]])
    return model, variables, x, out, (gt_boxes, gt_classes, gt_mask)


def _cls_grad_wrt_final_boxes(out, gts, legacy):
    """Gradient of the FINAL head's VFL term w.r.t. that head's boxes."""
    gt_boxes, gt_classes, gt_mask = gts
    boxes = list(out["intermediate_boxes"])

    def cls_term(final_boxes):
        o = dict(out)
        o["intermediate_boxes"] = boxes[:-1] + [final_boxes]
        _, aux = dfine_criterion(o, gt_boxes, gt_classes, gt_mask,
                                 TINY.num_labels, TINY.max_num_bins,
                                 legacy_vfl=legacy)
        return aux["cls"]

    return jax.grad(cls_term)(boxes[-1])


def test_legacy_vfl_restores_quality_target_gradient(setup):
    """Default: the VFL quality target is detached (grad of the cls term
    w.r.t. the box path is exactly zero, like HF's `ious.detach()`).
    Legacy arm: the clipped-GIoU target backprops into the boxes — the
    shortcut whose removal the criterion A/B quantifies."""
    _, _, _, out, gts = setup
    g_fixed = _cls_grad_wrt_final_boxes(out, gts, legacy=False)
    g_legacy = _cls_grad_wrt_final_boxes(out, gts, legacy=True)
    assert float(jnp.abs(g_fixed).max()) == 0.0
    assert float(jnp.abs(g_legacy).max()) > 0.0


def test_legacy_vfl_loss_differs_but_finite(setup):
    _, _, _, out, gts = setup
    gt_boxes, gt_classes, gt_mask = gts
    l_fixed, _ = dfine_criterion(out, gt_boxes, gt_classes, gt_mask,
                                 TINY.num_labels, TINY.max_num_bins)
    l_legacy, _ = dfine_criterion(out, gt_boxes, gt_classes, gt_mask,
                                  TINY.num_labels, TINY.max_num_bins,
                                  legacy_vfl=True)
    assert np.isfinite(float(l_fixed)) and np.isfinite(float(l_legacy))
    # different quality target (plain IoU vs clipped GIoU) -> different loss
    assert abs(float(l_fixed) - float(l_legacy)) > 1e-7


def test_parity_cpu_forward_subprocess_matches_inprocess(setup, monkeypatch):
    """`_jax_cpu_forward` must produce the in-process forward's outputs
    when forced onto the `JAX_PLATFORMS=cpu` child path — the fallback
    that keeps `eval_torch_parity` alive on the axon env, where
    `jax.local_devices(backend="cpu")` raises (it cost round 4 a
    finished 6000-step run; VERDICT r4 weak #1)."""
    model, variables, x, out, _ = setup
    sys.path.insert(0, TOOLS)
    try:
        import bench_accuracy as ba
    finally:
        sys.path.remove(TOOLS)

    monkeypatch.setenv("PAUTDX_FORCE_PARITY_SUBPROC", "1")
    got = ba._jax_cpu_forward(TINY, variables, np.asarray(x), batch=2)
    np.testing.assert_allclose(got["logits"], np.asarray(out["logits"]),
                               atol=1e-5)
    np.testing.assert_allclose(got["pred_boxes"],
                               np.asarray(out["pred_boxes"]), atol=1e-5)
