"""Import every shipped reference MSC checkpoint (OPD 320 + FPD 360
signal lengths) and verify outputs are sane probabilities — the full
`.pth` compatibility sweep of SURVEY §4 point (b)."""

import glob
import os

import numpy as np
import pytest

import jax.numpy as jnp

from pautdx.compat import import_msc, load_state_dict
from pautdx.models.signal import MultiSignalClassifier

CKPTS = sorted(glob.glob("/root/reference/signals/MultiSignalClassifier_model*.pth"))


@pytest.mark.skipif(not CKPTS, reason="reference checkpoints unavailable")
@pytest.mark.parametrize("path", CKPTS, ids=[os.path.basename(p) for p in CKPTS])
def test_import_every_msc_checkpoint(path):
    sd = load_state_dict(path)
    signal_length = sd["shared_layer.0.weight"].shape[1]
    variables = import_msc(sd)
    model = MultiSignalClassifier(hidden=(128, 64, 32), num_heads=4)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 6, signal_length)).astype(np.float32))
    out = np.asarray(model.apply(variables, x, train=False))
    assert out.shape == (1, 6)
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1).all()
    # responds to input (or confidently rejects pure noise everywhere —
    # some shipped checkpoints saturate to ~0 on random inputs)
    x2 = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 6, signal_length)).astype(np.float32) * 3)
    out2 = np.asarray(model.apply(variables, x2, train=False))
    assert (not np.allclose(out, out2)) or (out.max() < 0.01)
