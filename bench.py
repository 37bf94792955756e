"""Benchmark: D-FINE-nano B-scan inference throughput (frames/sec/chip).

Driver contract: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Workload matches the BASELINE.json north star: 640px B-scan frames through
the JAX D-FINE-nano detector, bf16 activations, jit-compiled, steady-state
timing on one chip. ``vs_baseline`` is value / 5000 (the >=5k
frames/sec/chip target; the torch reference records no throughput at all,
BASELINE.md).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from pautdx.models.vision.dfine import DFine, dfine_nano

    batch = 32
    img = 640
    cfg = dfine_nano(num_labels=2)
    model = DFine(cfg)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(batch, img, img, 3)).astype(np.float32),
        dtype=jnp.bfloat16)
    # init under jit: ONE compiled program instead of thousands of eager
    # op dispatches (critical under remote-compile tunnels); bf16 cast on
    # host so no per-leaf device round trips
    init_fn = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, img, img, 3), jnp.bfloat16),
        train=False))
    variables = jax.device_get(init_fn(jax.random.PRNGKey(0)))
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == np.float32 else x, variables)

    @jax.jit
    def forward(images, carry):
        # a scalar carry chains iterations so timing cannot be fooled by
        # async dispatch / lazy relays: each step depends on the previous
        out = model.apply(variables, images + carry * 0.0, train=False)
        return out["logits"], out["pred_boxes"], out["logits"].mean()

    # warmup/compile + real sync via host fetch
    carry = jnp.zeros((), jnp.bfloat16)
    _, _, carry = forward(images, carry)
    float(carry)

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        _, _, carry = forward(images, carry)
    float(carry)                      # host fetch forces full completion
    dt = time.perf_counter() - t0
    fps = batch * n_iters / dt

    print(json.dumps({
        "metric": "dfine_nano_640px_inference",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
