"""Tensor-parallel sharding rules (pautdx.mesh.tp) on the virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pautdx.mesh.tp import (
    mesh_2d, shard_params, tp_coverage, tp_spec_tree, tp_shardings,
)


def _fake_params():
    k = jax.random.PRNGKey(0)
    d, f = 16, 32
    return {
        "layers.0": {
            "self_attn": {
                "q_proj": {"kernel": jnp.ones((d, d)), "bias": jnp.ones(d)},
                "out_proj": {"kernel": jnp.ones((d, d)), "bias": jnp.ones(d)},
            },
            "fc1": {"kernel": jnp.ones((d, f)), "bias": jnp.ones(f)},
            "fc2": {"kernel": jnp.ones((f, d)), "bias": jnp.ones(d)},
            "norm": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        },
        "conv": {"kernel": jax.random.normal(k, (3, 3, 4, 8))},
    }


def test_spec_rules():
    specs = tp_spec_tree(_fake_params(), tp_size=2)
    blk = specs["layers.0"]
    assert blk["self_attn"]["q_proj"]["kernel"] == P(None, "tp")
    assert blk["self_attn"]["q_proj"]["bias"] == P("tp")
    assert blk["self_attn"]["out_proj"]["kernel"] == P("tp", None)
    # row-parallel bias replicated (not matched by any rule)
    assert blk["self_attn"]["out_proj"]["bias"] == P()
    assert blk["fc1"]["kernel"] == P(None, "tp")
    assert blk["fc2"]["kernel"] == P("tp", None)
    assert blk["norm"]["scale"] == P()
    assert specs["conv"]["kernel"] == P()


def test_aggregation_conv_pair_rules():
    """HGNet aggregation.0/.1 kernels get the conv Megatron pair."""
    params = {"stages.0": {"blocks.0": {
        "aggregation.0": {"convolution": {"kernel": jnp.ones((1, 1, 64, 32))}},
        "aggregation.1": {"convolution": {"kernel": jnp.ones((1, 1, 32, 64))}},
        "layers.0": {"convolution": {"kernel": jnp.ones((3, 3, 16, 16))}},
    }}}
    specs = tp_spec_tree(params, tp_size=2)
    blk = specs["stages.0"]["blocks.0"]
    assert blk["aggregation.0"]["convolution"]["kernel"] == \
        P(None, None, None, "tp")
    assert blk["aggregation.1"]["convolution"]["kernel"] == \
        P(None, None, "tp", None)
    assert blk["layers.0"]["convolution"]["kernel"] == P()


def test_hgnet_backbone_tp_forward_matches_replicated():
    """Real HGNet backbone: sharded-under-GSPMD forward == replicated
    forward, and the rules cover a meaningful fraction of its bytes."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    from pautdx.models.vision.hgnet import HGNetConfig, HGNetV2

    cfg = HGNetConfig(
        stem_channels=(3, 8, 8), stage_in_channels=(8, 16, 32, 64),
        stage_mid_channels=(8, 8, 16, 32),
        stage_out_channels=(16, 32, 64, 128),
        stage_num_blocks=(1, 1, 1, 1), stage_num_layers=(1, 1, 2, 2),
    )
    model = HGNetV2(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 64, 64, 3)),
                    jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    want = model.apply(variables, x, train=False)

    mesh = mesh_2d(8, tp=2)
    assert tp_coverage(variables["params"], tp_size=2) > 0.25
    psh = tp_shardings(variables["params"], mesh)
    params_sh = jax.tree_util.tree_map(jax.device_put,
                                       variables["params"], psh)
    xsh = jax.device_put(x, NamedSharding(mesh, P("dp")))

    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p,
                            "batch_stats": variables["batch_stats"]},
                           x, train=False)

    got = fwd(params_sh, xsh)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_indivisible_dim_falls_back_to_replication():
    params = {"fc1": {"kernel": jnp.ones((4, 6))}}   # 6 % 4 != 0
    specs = tp_spec_tree(params, tp_size=4)
    assert specs["fc1"]["kernel"] == P()


def test_mesh_2d_clamps_tp():
    m = mesh_2d(8, tp=2)
    assert m.devices.shape == (4, 2) and m.axis_names == ("dp", "tp")
    m = mesh_2d(7, tp=2)                              # 7 % 2 -> tp=1
    assert m.devices.shape == (7, 1)


def test_tp_matmul_chain_matches_replicated():
    """Column-parallel fc1 + row-parallel fc2 under GSPMD == dense result."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = mesh_2d(8, tp=2)
    rng = np.random.default_rng(0)
    params = {
        "fc1": {"kernel": jnp.asarray(rng.normal(size=(16, 32)), jnp.float32),
                "bias": jnp.asarray(rng.normal(size=32), jnp.float32)},
        "fc2": {"kernel": jnp.asarray(rng.normal(size=(32, 16)), jnp.float32),
                "bias": jnp.asarray(rng.normal(size=16), jnp.float32)},
    }
    x = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)

    def f(p, x):
        h = jax.nn.relu(x @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        return h @ p["fc2"]["kernel"] + p["fc2"]["bias"]

    want = f(params, x)

    sharded = shard_params(params, mesh)
    sh = tp_shardings(params, mesh)
    assert sh["fc1"]["kernel"].spec == P(None, "tp")
    got = jax.jit(f, in_shardings=(sh, NamedSharding(mesh, P("dp"))))(
        sharded, jax.device_put(x, NamedSharding(mesh, P("dp"))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dfine_full_model_tp_forward_matches_replicated():
    """Round-4 widened rules (MLPHead pairs, gateway gate, CSP bottleneck
    chains): the FULL tiny D-FINE forward under tp sharding must equal
    the replicated forward, and the widened rules must cover >60% of
    dfine_nano's parameter bytes (was 42% with the round-3 rules)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    import dataclasses

    from pautdx.models.vision.dfine import DFine, DFineConfig, dfine_nano
    from pautdx.models.vision.hgnet import HGNetConfig

    cfg = DFineConfig(
        num_labels=2, d_model=64, encoder_hidden_dim=64, decoder_layers=2,
        decoder_attention_heads=4, encoder_attention_heads=4,
        decoder_ffn_dim=128, encoder_ffn_dim=128, num_queries=16,
        max_num_bins=16, hidden_expansion=0.5,
        backbone=HGNetConfig(
            stem_channels=(3, 8, 8), stage_in_channels=(8, 16, 32, 64),
            stage_mid_channels=(8, 8, 16, 32),
            stage_out_channels=(16, 32, 64, 128),
            stage_num_blocks=(1, 1, 1, 1), stage_num_layers=(1, 1, 2, 2)),
    )
    model = DFine(cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 64, 64, 3)),
                    jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False)
    want = model.apply(variables, x, train=False)

    mesh = mesh_2d(8, tp=2)
    psh = tp_shardings(variables["params"], mesh)
    params_sh = jax.tree_util.tree_map(jax.device_put,
                                       variables["params"], psh)
    xsh = jax.device_put(x, NamedSharding(mesh, P("dp")))

    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p,
                            "batch_stats": variables["batch_stats"]},
                           x, train=False)

    got = fwd(params_sh, xsh)
    for k in ("logits", "pred_boxes"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=5e-4, atol=5e-4)

    # pin the honest coverage number on the real nano preset
    nano = DFine(dfine_nano(num_labels=2))
    nv = nano.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 128, 128, 3)), train=False)
    assert tp_coverage(nv["params"], tp_size=2) > 0.6
