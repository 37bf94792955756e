"""Numerical parity: reference .pth -> pautdx MSC vs independent numpy math.

This is the BASELINE config-2 parity check (MSC .pth parity). The oracle is
a from-scratch numpy evaluation of the checkpoint (Linear/MHA/sigmoid
semantics of torch), NOT the reference's torch code — so parity here proves
both the importer layout and the TinyMHA math match torch's
nn.MultiheadAttention.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from pautdx.compat import import_msc, load_state_dict
from pautdx.models.signal import MultiSignalClassifier

REF_PTH = "/root/reference/signals/MultiSignalClassifier_modelOPD.pth"


def numpy_msc_forward(sd, x):
    """Independent numpy oracle for the MSC checkpoint."""
    B, N, S = x.shape
    h = x.reshape(B * N, S)
    h = np.maximum(h @ sd["shared_layer.0.weight"].T + sd["shared_layer.0.bias"], 0)
    h = np.maximum(h @ sd["shared_layer.2.weight"].T + sd["shared_layer.2.bias"], 0)
    h = h.reshape(B, N, -1)
    d = h.shape[-1]
    w_in, b_in = sd["attention.in_proj_weight"], sd["attention.in_proj_bias"]
    q = h @ w_in[:d].T + b_in[:d]
    k = h @ w_in[d:2 * d].T + b_in[d:2 * d]
    v = h @ w_in[2 * d:].T + b_in[2 * d:]
    heads, dh = 4, d // 4
    def split(t):
        return t.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q), split(k), split(v)
    logits = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(dh)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    a = (w @ vh).transpose(0, 2, 1, 3).reshape(B, N, d)
    a = a @ sd["attention.out_proj.weight"].T + sd["attention.out_proj.bias"]
    c = np.maximum(a @ sd["classifier.0.weight"].T + sd["classifier.0.bias"], 0)
    c = c @ sd["classifier.2.weight"].T + sd["classifier.2.bias"]
    return 1.0 / (1.0 + np.exp(-c[..., 0]))


@pytest.mark.skipif(not os.path.exists(REF_PTH),
                    reason="reference checkpoint unavailable")
def test_msc_pth_parity():
    sd = load_state_dict(REF_PTH)
    variables = import_msc(sd)
    model = MultiSignalClassifier(hidden=(128, 64, 32), num_heads=4)
    x = np.random.default_rng(0).normal(size=(2, 7, 320)).astype(np.float32)
    expected = numpy_msc_forward(sd, x)
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert got.shape == expected.shape == (2, 7)
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)
    # sane probability outputs
    assert (got >= 0).all() and (got <= 1).all()


@pytest.mark.skipif(not os.path.exists(REF_PTH),
                    reason="reference checkpoint unavailable")
def test_msc_pth_parity_against_torch_mha():
    """Cross-check the numpy oracle itself against torch's MHA op (not the
    reference's model code): guards the oracle from drifting."""
    import torch

    sd = load_state_dict(REF_PTH)
    x = np.random.default_rng(1).normal(size=(1, 5, 320)).astype(np.float32)
    h = np.maximum(x.reshape(5, 320) @ sd["shared_layer.0.weight"].T
                   + sd["shared_layer.0.bias"], 0)
    h = np.maximum(h @ sd["shared_layer.2.weight"].T
                   + sd["shared_layer.2.bias"], 0).reshape(1, 5, 64)
    mha = torch.nn.MultiheadAttention(64, 4, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.from_numpy(sd["attention.in_proj_weight"]))
        mha.in_proj_bias.copy_(torch.from_numpy(sd["attention.in_proj_bias"]))
        mha.out_proj.weight.copy_(torch.from_numpy(sd["attention.out_proj.weight"]))
        mha.out_proj.bias.copy_(torch.from_numpy(sd["attention.out_proj.bias"]))
        t = torch.from_numpy(h)
        torch_attn = mha(t, t, t)[0].numpy()
    variables = import_msc(sd)
    model = MultiSignalClassifier(hidden=(128, 64, 32), num_heads=4)
    # full-path numpy oracle vs torch attention block
    full = numpy_msc_forward(sd, x)
    c = np.maximum(torch_attn @ sd["classifier.0.weight"].T
                   + sd["classifier.0.bias"], 0)
    c = c @ sd["classifier.2.weight"].T + sd["classifier.2.bias"]
    torch_out = 1.0 / (1.0 + np.exp(-c[..., 0]))
    np.testing.assert_allclose(full, torch_out, atol=2e-5, rtol=1e-4)
