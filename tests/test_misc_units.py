import numpy as np

import jax
import jax.numpy as jnp

from pautdx.eval.map import average_precision
from pautdx.losses.yolo import _dfl_loss
from pautdx.models.vision.yolo import YoloConfig, dfl_expectation
from pautdx.train.optim import ReduceLROnPlateau, cosine_schedule, ema_update
from pautdx.utils.autogates import gate_mask


def test_dfl_expectation_matches_argmax_for_peaked_logits():
    reg_max = 8
    logits = np.full((1, 4 * reg_max), -20.0, np.float32)
    # side 0 peaked at bin 3, side 1 at bin 5
    logits[0, 3] = 20.0
    logits[0, reg_max + 5] = 20.0
    e = np.asarray(dfl_expectation(jnp.asarray(logits), reg_max))
    assert abs(e[0, 0] - 3.0) < 1e-3
    assert abs(e[0, 1] - 5.0) < 1e-3


def test_dfl_loss_zero_for_perfect_distribution():
    reg_max = 8
    target = jnp.asarray([[2.0, 3.0, 4.0, 5.0]])
    logits = np.full((1, 4 * reg_max), -30.0, np.float32)
    for side, t in enumerate([2, 3, 4, 5]):
        logits[0, side * reg_max + t] = 30.0
    loss = float(_dfl_loss(jnp.asarray(logits), target, reg_max)[0])
    assert loss < 1e-3
    # off-target distribution costs more
    bad = np.roll(logits.reshape(4, reg_max), 2, axis=1).reshape(1, -1)
    assert float(_dfl_loss(jnp.asarray(bad), target, reg_max)[0]) > 1.0


def test_average_precision_edges():
    assert average_precision(np.asarray([1.0]), np.asarray([1.0])) > 0.99
    assert average_precision(np.asarray([0.0]), np.asarray([0.0])) < 0.02


def test_ema_and_schedules():
    p = {"w": jnp.ones((2,))}
    e = {"w": jnp.zeros((2,))}
    out = ema_update(e, p, decay=0.9)
    assert np.allclose(out["w"], 0.1)
    s = cosine_schedule(1e-3, total_steps=100, warmup_steps=10)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 1e-3) < 1e-9
    assert float(s(100)) < 1e-3

    pl = ReduceLROnPlateau(factor=0.5, patience=1)
    assert pl.step(1.0) == 1.0     # first epoch = best
    assert pl.step(1.0) == 1.0     # bad 1 (<= patience)
    assert pl.step(1.0) == 0.5     # bad 2 -> reduce
    assert pl.step(0.5) == 0.5     # improved -> hold


def test_gate_mask_zeroes_outside():
    sig = jnp.ones((2, 10))
    out = np.asarray(gate_mask(sig, jnp.asarray(3), jnp.asarray(7)))
    assert out[:, 3:7].sum() == 8
    assert out[:, :3].sum() == 0 and out[:, 7:].sum() == 0


def test_yolo_config_scales():
    n = YoloConfig(scale="n")
    s = YoloConfig(scale="s")
    assert n.width(64) == 16 and s.width(64) == 32
    assert n.depth(3) == 1 and YoloConfig(scale="m").depth(3) == 2



def test_hgnet_patchify8_shapes():
    import jax
    import jax.numpy as jnp
    from pautdx.models.vision.hgnet import HGNetConfig, HGNetV2

    cfg = HGNetConfig(stem="patchify8", start_stage=2, out_indices=(2, 3))
    m = HGNetV2(cfg)
    v = m.init({"params": jax.random.PRNGKey(0)},
               jnp.zeros((1, 128, 128, 3)), train=False)
    feats = m.apply(v, jnp.zeros((2, 128, 128, 3)), train=False)
    # stem stride 8 -> stage2 downsamples to /16, stage3 to /32
    assert feats[0].shape == (2, 8, 8, cfg.stage_out_channels[2])
    assert feats[1].shape == (2, 4, 4, cfg.stage_out_channels[3])


def test_patchify_s2d_matches_conv():
    """The space-to-depth patchify stem is bit-identical to the k/s conv
    with the SAME params (kernel shape is shared, so checkpoints are
    interchangeable between the two lowering strategies)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from pautdx.models.vision.hgnet import HGNetConfig, HGNetV2

    cfg = HGNetConfig(stem="patchify8", start_stage=2, out_indices=(2, 3))
    m_conv = HGNetV2(cfg)
    m_s2d = HGNetV2(dataclasses.replace(cfg, stem_s2d=True))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    v = m_conv.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # same param tree (shapes included) ...
    jax.tree_util.tree_map(
        lambda a, b: None,
        v, m_s2d.init({"params": jax.random.PRNGKey(1)}, x, train=False))
    # ... and identical outputs from identical params
    for a, b in zip(m_conv.apply(v, x, train=False),
                    m_s2d.apply(v, x, train=False)):
        assert jnp.abs(a - b).max() == 0.0
    # non-divisible inputs fail with a CLEAR error (ADVICE r3): the conv
    # path silently SAME-pads; the s2d reshape cannot
    import pytest
    bad = jnp.zeros((1, 63, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match="divisible by the patch size"):
        m_s2d.init({"params": jax.random.PRNGKey(2)}, bad, train=False)


def test_dfine_nano_stride8_forward():
    import jax
    import jax.numpy as jnp
    from pautdx.models.vision.dfine import DFine, dfine_nano

    cfg = dfine_nano(num_labels=2, stride8_stem=True)
    m = DFine(cfg)
    v = m.init({"params": jax.random.PRNGKey(0)},
               jnp.zeros((1, 128, 128, 3)), train=False)
    out = m.apply(v, jnp.zeros((1, 128, 128, 3)), train=False)
    # at 128px the 16/32-stride levels expose 8*8+4*4=80 anchors, so the
    # query top-k clamps to 80 (num_queries=150 applies at >=320px)
    q = min(cfg.num_queries, 80)
    assert out["logits"].shape == (1, q, 2)
    assert out["pred_boxes"].shape == (1, q, 4)


def test_adaptive_avg_pool1d_matches_torch():
    """Exact torch AdaptiveAvgPool1d parity INCLUDING non-divisible
    lengths — the canonical reference models pool with
    nn.AdaptiveAvgPool1d(128) (`complex_detection_model.py:34`) and both
    shipped signal lengths (320 OPD, 360 FPD) produce non-uniform bins
    that a linear resample does not reproduce."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp
    from pautdx.nn.blocks import adaptive_avg_pool1d

    for L in (320, 360, 256, 100):
        x = np.random.default_rng(0).normal(size=(2, L, 5)).astype(np.float32)
        ours = np.asarray(adaptive_avg_pool1d(jnp.asarray(x), 128))
        ref = torch.nn.AdaptiveAvgPool1d(128)(
            torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
        assert np.abs(ours - ref).max() < 1e-5, L


def test_patchify_s2d_slices_impl_matches_transpose():
    """The "slices" s2d lowering (64 strided views concatenated in
    (ki, kj, c) order) is bit-identical to the default transpose
    lowering with the SAME params — the two are alternative XLA
    lowerings of one patchify, picked per-config by on-chip A/B."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from pautdx.models.vision.hgnet import HGNetConfig, HGNetV2

    cfg = HGNetConfig(stem="patchify8", start_stage=2, out_indices=(2, 3),
                      stem_s2d=True)
    m_t = HGNetV2(cfg)
    m_s = HGNetV2(dataclasses.replace(cfg, stem_s2d_impl="slices"))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    v = m_t.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    for a, b in zip(m_t.apply(v, x, train=False),
                    m_s.apply(v, x, train=False)):
        assert jnp.abs(a - b).max() == 0.0
