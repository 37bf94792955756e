"""Orbax checkpoint roundtrip for D-FINE (dotted module names) + trainer
metadata contract."""

import jax
import jax.numpy as jnp
import numpy as np

from pautdx.train import CheckpointManager
from tests.test_dfine_train import TINY


def test_dfine_checkpoint_roundtrip(tmp_path):
    from pautdx.models.vision.dfine import DFine

    model = DFine(TINY)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ckpt = CheckpointManager(str(tmp_path))
    state = jax.device_get({"params": variables["params"],
                            "batch_stats": variables["batch_stats"]})
    ckpt.save(0, state, metadata={"model": "dfine", "num_labels": 2,
                                  "id2label": {"0": "FO", "1": "Crack"}},
              is_best=True)
    restored, meta = ckpt.restore("best", target=state)
    assert meta["id2label"]["1"] == "Crack"
    # dotted keys survive
    k0 = restored["params"]["model.backbone.model"]["embedder"]["stem1"]
    k0_ref = state["params"]["model.backbone.model"]["embedder"]["stem1"]
    np.testing.assert_allclose(k0["convolution"]["kernel"],
                               k0_ref["convolution"]["kernel"])
    out_ref = model.apply(variables, x, train=False)
    out_new = model.apply({"params": restored["params"],
                           "batch_stats": restored["batch_stats"]}, x,
                          train=False)
    np.testing.assert_allclose(np.asarray(out_new["logits"]),
                               np.asarray(out_ref["logits"]), atol=1e-6)
