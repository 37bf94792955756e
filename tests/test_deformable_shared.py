"""Head-shared deformable sampling: must equal the per-head path when
every head is given the same locations (the shared path IS that, with
the gather restructured to full-lane rows)."""

import numpy as np

import jax
import jax.numpy as jnp

from pautdx.ops.deformable import (
    ms_deformable_attention, ms_deformable_attention_shared,
)

B, Q, HEADS, DH = 2, 6, 4, 8
PTS = [4, 4, 4]
SHAPES = [(10, 10), (5, 5), (3, 3)]


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    values = [jnp.asarray(rng.normal(size=(B, h, w, HEADS, DH)), jnp.float32)
              for (h, w) in SHAPES]
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (B, Q, sum(PTS), 2)),
                      jnp.float32)
    w = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, Q, HEADS, sum(PTS))), jnp.float32),
        axis=-1)
    return values, loc, w


def test_shared_equals_perhead_with_tiled_locations():
    for method in ("default", "discrete"):
        values, loc, w = _setup()
        shared = ms_deformable_attention_shared(values, loc, w, PTS,
                                                method=method)
        tiled = jnp.broadcast_to(loc[:, :, None], (B, Q, HEADS, sum(PTS), 2))
        perhead = ms_deformable_attention(values, tiled, w, PTS,
                                          method=method)
        np.testing.assert_allclose(np.asarray(shared), np.asarray(perhead),
                                   rtol=1e-5, atol=1e-5)


def test_shared_matches_naive_loops():
    """Independent naive numpy implementation (nearest mode)."""
    values, loc, w = _setup(seed=3)
    out = np.asarray(
        ms_deformable_attention_shared(values, loc, w, PTS,
                                       method="discrete"))
    vals = [np.asarray(v) for v in values]
    locn = np.asarray(loc)
    wn = np.asarray(w)
    expect = np.zeros((B, Q, HEADS, DH), np.float32)
    for b in range(B):
        for q in range(Q):
            off = 0
            for lvl, (H, W) in enumerate(SHAPES):
                for p in range(PTS[lvl]):
                    x, y = locn[b, q, off + p]
                    xi = min(max(int(np.floor(x * W - 0.5 + 1.0)), 0), W - 1)
                    yi = min(max(int(np.floor(y * H - 0.5 + 1.0)), 0), H - 1)
                    for h in range(HEADS):
                        expect[b, q, h] += (wn[b, q, h, off + p]
                                            * vals[lvl][b, yi, xi, h])
                off += PTS[lvl]
    np.testing.assert_allclose(out, expect.reshape(B, Q, HEADS * DH),
                               rtol=1e-4, atol=1e-4)


def test_nano_preset_uses_shared_points_and_trains():
    """Tiny shared-points D-FINE: grads flow, loss finite."""
    import optax

    from pautdx.losses.detr import dfine_criterion
    from pautdx.models.vision.dfine import DFine, DFineConfig
    from pautdx.models.vision.hgnet import HGNetConfig

    cfg = DFineConfig(
        num_labels=2, d_model=64, encoder_hidden_dim=64, decoder_layers=2,
        decoder_attention_heads=4, encoder_attention_heads=4,
        decoder_ffn_dim=128, encoder_ffn_dim=128, num_queries=20,
        max_num_bins=16, hidden_expansion=0.5, decoder_shared_points=True,
        backbone=HGNetConfig(
            stem_channels=(3, 8, 8), stage_in_channels=(8, 16, 32, 64),
            stage_mid_channels=(8, 8, 16, 32),
            stage_out_channels=(16, 32, 64, 128),
            stage_num_blocks=(1, 1, 1, 1), stage_num_layers=(1, 1, 2, 2),
        ),
    )
    model = DFine(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    gt_boxes = jnp.asarray([[[0.4, 0.4, 0.2, 0.2]]] * 2, jnp.float32)
    gt_classes = jnp.zeros((2, 1), jnp.int32)
    gt_mask = jnp.ones((2, 1), jnp.float32)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, x,
            train=True, rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        loss, _ = dfine_criterion(out, gt_boxes, gt_classes, gt_mask,
                                  cfg.num_labels, cfg.max_num_bins)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
    # shared mode: offsets head is 1x points wide
    off_kernel = variables["params"]["model.decoder.layers.0"][
        "encoder_attn"]["sampling_offsets"]["kernel"]
    assert off_kernel.shape[-1] == sum(cfg.num_points_list) * 2
