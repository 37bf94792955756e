"""Staged D-FINE performance probe: time each pipeline stage on the chip.

Usage: python tools/perf_probe.py [img] [batch]
Stages: backbone -> +encoder -> +query selection -> full model.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from pautdx.models.vision.dfine import (
    DFine, DFineConfig, HybridEncoder, MLPHead, dfine_nano,
)
from pautdx.models.vision.hgnet import HGNetV2
from flax import linen as nn


def timeit(name, fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name}: {dt:.2f} ms/iter")
    return dt


def main():
    img = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cfg = dfine_nano(num_labels=2)
    model = DFine(cfg)
    init_fn = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, img, img, 3), jnp.bfloat16),
        train=False))
    variables = jax.device_get(init_fn(jax.random.PRNGKey(0)))
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == np.float32 else x, variables)
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, img, img, 3)),
        dtype=jnp.bfloat16)
    p, bs = variables["params"], variables["batch_stats"]

    hg_vars = {"params": p["model.backbone.model"],
               "batch_stats": bs["model.backbone.model"]}
    hg = HGNetV2(cfg.backbone)
    timeit("backbone", jax.jit(
        lambda im: hg.apply(hg_vars, im, train=False)), images)

    def through_encoder(im):
        feats = hg.apply(hg_vars, im, train=False)
        proj = []
        for i, f in enumerate(feats):
            k = p[f"model.encoder_input_proj.{i}.0"]["kernel"]
            f2 = jax.lax.conv_general_dilated(
                f, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            bnp_ = p[f"model.encoder_input_proj.{i}.1"]
            bns = bs[f"model.encoder_input_proj.{i}.1"]
            f2 = ((f2 - bns["mean"]) * jax.lax.rsqrt(bns["var"] + 1e-5)
                  * bnp_["scale"] + bnp_["bias"])
            proj.append(f2)
        enc_vars = {"params": p["model.encoder"],
                    "batch_stats": bs["model.encoder"]}
        return HybridEncoder(cfg).apply(enc_vars, proj, train=False)

    timeit("backbone+encoder", jax.jit(
        lambda im: through_encoder(im)[-1]), images)

    timeit("full", jax.jit(
        lambda im: model.apply(variables, im, train=False)["logits"]),
        images)


if __name__ == "__main__":
    main()
