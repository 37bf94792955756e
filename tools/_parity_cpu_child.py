"""JAX-CPU forward child for ``tools/bench_accuracy.py::eval_torch_parity``.

The axon environment exposes ONLY the TPU backend in-process
(``jax.local_devices(backend="cpu")`` raises ``Unknown backend cpu`` —
this exact lookup cost round 4 a finished 6000-step training run). The
parity claim is "identical weights through torch match JAX" and torch
runs on the host CPU in f32, so the apples-to-apples JAX forward runs
here, in a fresh process pinned to the CPU platform before any backend
initializes.

Usage: python tools/_parity_cpu_child.py payload.pkl out.npz
payload.pkl (pickle): {"cfg": DFineConfig, "variables": pytree,
"images": (N, H, W, 3) f32, "batch": int}
out.npz: logits (N, Q, C) f32, pred_boxes (N, Q, 4) f32.
"""

import os
import pickle
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax

# the axon sitecustomize overrides the env var at import; the config
# update below is what actually pins the platform (same trick as
# tests/conftest.py and bench_accuracy.main)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    inp, outp = sys.argv[1], sys.argv[2]
    with open(inp, "rb") as f:
        payload = pickle.load(f)

    from pautdx.models.vision.dfine import DFine

    model = DFine(payload["cfg"])
    variables = payload["variables"]
    images = payload["images"]
    batch = int(payload["batch"])

    jf = jax.jit(lambda v, x: model.apply(v, x, train=False))
    logits, boxes = [], []
    for a in range(0, images.shape[0], batch):
        out = jf(variables, jnp.asarray(images[a:a + batch]))
        logits.append(np.asarray(out["logits"], np.float32))
        boxes.append(np.asarray(out["pred_boxes"], np.float32))
    np.savez(outp, logits=np.concatenate(logits),
             pred_boxes=np.concatenate(boxes))
    print(f"parity child: {images.shape[0]} frames done", flush=True)


if __name__ == "__main__":
    main()
