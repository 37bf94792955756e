"""Numerical parity: JAX D-FINE vs HF torch D-FINE with identical weights.

A randomly-initialized torch ``DFineForObjectDetection`` (small config) is
the oracle: its state dict is converted by ``pautdx.compat.dfine_import``
and both models run the same input. Matching logits/boxes proves the whole
stack — HGNetV2, hybrid encoder (AIFI+FPN/PAN), deformable attention,
FDR integral/distance2bbox, LQE — is architecture-exact, which is what
makes reference HF checkpoints loadable (BASELINE configs 4-5).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pautdx.compat.dfine_import import (  # noqa: E402
    convert_state_dict, load_torch_model_state,
)
from pautdx.models.vision.dfine import DFine, DFineConfig  # noqa: E402
from pautdx.models.vision.hgnet import HGNetConfig, HGNetV2  # noqa: E402

IMG = 64


def _small_hf_configs():
    from transformers import DFineConfig as HFDFineConfig
    from transformers import HGNetV2Config

    backbone = HGNetV2Config(
        stem_channels=[3, 8, 8],
        stage_in_channels=[8, 16, 32, 64],
        stage_mid_channels=[8, 8, 16, 32],
        stage_out_channels=[16, 32, 64, 128],
        stage_num_blocks=[1, 1, 1, 1],
        stage_numb_of_layers=[1, 1, 2, 2],
        stage_downsample=[False, True, True, True],
        stage_light_block=[False, False, True, True],
        stage_kernel_size=[3, 3, 5, 5],
        use_learnable_affine_block=True,
        embedding_size=8,
        hidden_sizes=[16, 32, 64, 128],
        depths=[1, 1, 1, 1],
        out_features=["stage2", "stage3", "stage4"],
    )
    hf = HFDFineConfig(
        backbone_config=backbone,
        num_labels=3,
        d_model=64,
        encoder_hidden_dim=64,
        encoder_in_channels=[32, 64, 128],
        decoder_in_channels=[64, 64, 64],
        decoder_layers=2,
        decoder_attention_heads=4,
        num_attention_heads=4,
        decoder_ffn_dim=128,
        encoder_ffn_dim=128,
        num_queries=20,
        max_num_bins=16,
        num_denoising=0,
        anchor_image_size=None,
        eval_size=None,
        hidden_expansion=0.5,
        eval_idx=-1,
    )
    mine = DFineConfig(
        num_labels=3, d_model=64, encoder_hidden_dim=64,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_attention_heads=4, decoder_ffn_dim=128, encoder_ffn_dim=128,
        num_queries=20, max_num_bins=16, hidden_expansion=0.5,
        lqe_hidden_dim=64,
        backbone=HGNetConfig(
            stem_channels=(3, 8, 8),
            stage_in_channels=(8, 16, 32, 64),
            stage_mid_channels=(8, 8, 16, 32),
            stage_out_channels=(16, 32, 64, 128),
            stage_num_blocks=(1, 1, 1, 1),
            stage_num_layers=(1, 1, 2, 2),
            stage_downsample=(False, True, True, True),
            stage_light_block=(False, False, True, True),
            stage_kernel_size=(3, 3, 5, 5),
        ),
    )
    return hf, mine


@pytest.fixture(scope="module")
def models():
    from transformers.models.d_fine.modeling_d_fine import (
        DFineForObjectDetection,
    )
    hf_cfg, my_cfg = _small_hf_configs()
    torch.manual_seed(0)
    tm = DFineForObjectDetection(hf_cfg).eval()
    # HF's default init (std 0.01) collapses activations to ~1e-25 in a
    # randomly-initialized model, making every anchor score tie at the head
    # bias (top-k order then meaningless). Re-randomize at a healthy scale
    # so the parity comparison exercises real, distinct activations.
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p_ in tm.parameters():
            p_.uniform_(-0.15, 0.15, generator=g)
    jm = DFine(my_cfg)
    x = np.random.default_rng(0).normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    target = jm.init({"params": jax.random.PRNGKey(0)},
                     jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    variables, unused = convert_state_dict(load_torch_model_state(tm), target)
    return tm, jm, variables, x, unused


def test_backbone_parity(models):
    tm, jm, variables, x, _ = models
    with torch.no_grad():
        tfeats = tm.model.backbone(torch.from_numpy(x),
                                   torch.ones((1, IMG, IMG)))
    sub = {"params": variables["params"]["model.backbone.model"],
           "batch_stats": variables["batch_stats"]["model.backbone.model"]}
    hg = HGNetV2(jm.cfg.backbone)
    jfeats = hg.apply(sub, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    for (tf, _), jf in zip(tfeats, jfeats):
        t = tf.numpy()
        j = np.asarray(jf).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(j, t, atol=1e-4, rtol=1e-3)


def test_discrete_sampling_parity():
    """The 'discrete' (nearest) deformable mode matches HF's discrete path."""
    import dataclasses
    import torch as _torch
    from transformers.models.d_fine.modeling_d_fine import (
        DFineForObjectDetection,
    )
    from pautdx.compat.dfine_import import (
        convert_state_dict, load_torch_model_state,
    )
    hf_cfg, my_cfg = _small_hf_configs()
    hf_cfg.decoder_method = "discrete"
    my_cfg = dataclasses.replace(my_cfg, decoder_method="discrete")
    _torch.manual_seed(0)
    tm = DFineForObjectDetection(hf_cfg).eval()
    g = _torch.Generator().manual_seed(1)
    with _torch.no_grad():
        for p_ in tm.parameters():
            p_.uniform_(-0.15, 0.15, generator=g)
    jm = DFine(my_cfg)
    x = np.random.default_rng(3).normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    target = jm.init({"params": jax.random.PRNGKey(0)},
                     jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    variables, _ = convert_state_dict(load_torch_model_state(tm), target)
    with _torch.no_grad():
        tout = tm(_torch.from_numpy(x))
    jout = jm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    train=False)
    from scipy.optimize import linear_sum_assignment
    ft = np.concatenate([tout.pred_boxes.numpy(),
                         1 / (1 + np.exp(-tout.logits.numpy()))], -1)[0]
    fj = np.concatenate([np.asarray(jout["pred_boxes"]),
                         1 / (1 + np.exp(-np.asarray(jout["logits"])))], -1)[0]
    cost = np.linalg.norm(ft[:, None] - fj[None], axis=-1)
    r, c_idx = linear_sum_assignment(cost)
    matched = cost[r, c_idx]
    assert (matched < 2e-3).sum() >= matched.shape[0] - 4, np.sort(matched)[-6:]


def test_full_model_parity(models):
    tm, jm, variables, x, unused = models
    # only denoising / buffer keys may go unused
    for k in unused:
        assert any(s in k for s in
                   ("denoising", "anchors", "valid_mask", "num_points_scale",
                    "reg_scale", "up", "num_batches_tracked",
                    # tied-weight aliases of the top-level heads
                    "model.decoder.class_embed", "model.decoder.bbox_embed")), k
    with torch.no_grad():
        tout = tm(torch.from_numpy(x))
    jout = DFine(jm.cfg).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    t_logits = tout.logits.numpy()
    t_boxes = tout.pred_boxes.numpy()
    j_logits = np.asarray(jout["logits"])
    j_boxes = np.asarray(jout["pred_boxes"])
    assert j_logits.shape == t_logits.shape
    assert j_boxes.shape == t_boxes.shape
    # query ORDER may differ: near-equal anchor scores swap ranks in top-k
    # under float divergence. Require a bijection between torch and jax
    # queries with tiny cost (permutation-invariant parity).
    from scipy.optimize import linear_sum_assignment

    def feats(boxes, logits):
        return np.concatenate([boxes, 1 / (1 + np.exp(-logits))], axis=-1)

    ft, fj = feats(t_boxes, t_logits)[0], feats(j_boxes, j_logits)[0]
    cost = np.linalg.norm(ft[:, None, :] - fj[None, :, :], axis=-1)
    r, c_idx = linear_sum_assignment(cost)
    matched = cost[r, c_idx]
    # a few queries at the top-k score boundary may select different
    # anchors under float divergence; all others must match tightly
    Q = matched.shape[0]
    assert (matched < 2e-3).sum() >= Q - 4, np.sort(matched)[-6:]
    assert np.median(matched) < 1e-3


def test_export_jax_weights_to_torch_parity(models):
    """Inverse direction: JAX-held weights -> torch state dict -> same
    outputs. This is the path that lets JAX-TRAINED D-FINE weights run
    through the HF torch model for mAP-parity evidence."""
    from pautdx.compat.dfine_import import export_state_dict

    tm, jm, variables, x, _ = models
    sd = export_state_dict(variables, load_torch_model_state(tm))
    hf_cfg, _ = _small_hf_configs()
    from transformers.models.d_fine.modeling_d_fine import (
        DFineForObjectDetection,
    )
    tm2 = DFineForObjectDetection(hf_cfg).eval()
    tm2.load_state_dict({k: torch.from_numpy(np.asarray(v))
                         for k, v in sd.items()})
    with torch.no_grad():
        tout = tm2(torch.from_numpy(x))
    jout = DFine(jm.cfg).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    from scipy.optimize import linear_sum_assignment

    def feats(boxes, logits):
        return np.concatenate([boxes, 1 / (1 + np.exp(-logits))], axis=-1)

    ft = feats(tout.pred_boxes.numpy(), tout.logits.numpy())[0]
    fj = feats(np.asarray(jout["pred_boxes"]), np.asarray(jout["logits"]))[0]
    cost = np.linalg.norm(ft[:, None, :] - fj[None, :, :], axis=-1)
    r, c_idx = linear_sum_assignment(cost)
    matched = cost[r, c_idx]
    assert (matched < 2e-3).sum() >= matched.shape[0] - 4, np.sort(matched)[-6:]
