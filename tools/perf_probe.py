"""Staged D-FINE performance probe with relay-proof chained timing.

``block_until_ready`` does not reliably sync on tunneled PJRT relays, so
every measurement chains iterations through a scalar carry and ends with a
host fetch — the only trustworthy fence.

Usage: python tools/perf_probe.py [img] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from pautdx.models.vision.dfine import DFine, HybridEncoder, dfine_nano
from pautdx.models.vision.hgnet import HGNetV2


def chained_time(name, fn, images, iters=20):
    """fn(images, carry) -> scalar; chained + host-fetched timing."""
    f = jax.jit(fn)
    carry = jnp.zeros((), images.dtype)
    carry = f(images, carry)
    float(carry)                       # compile + sync
    t0 = time.time()
    for _ in range(iters):
        carry = f(images, carry)
    float(carry)
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

    chained_time(
        "backbone",
        lambda im, c: hg.apply(hg_vars, im + c * 0, train=False)[-1].mean(),
        images)

    def encoder_stage(im, c):
        feats = hg.apply(hg_vars, im + c * 0, train=False)
        proj = []
        for i, f in enumerate(feats):
            f = f.astype(im.dtype)
            k = p[f"model.encoder_input_proj.{i}.0"]["kernel"].astype(im.dtype)
            f2 = jax.lax.conv_general_dilated(
                f, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            bnp_ = p[f"model.encoder_input_proj.{i}.1"]
            bns = bs[f"model.encoder_input_proj.{i}.1"]
            f2 = ((f2 - bns["mean"]) * jax.lax.rsqrt(bns["var"] + 1e-5)
                  * bnp_["scale"] + bnp_["bias"])
            proj.append(f2.astype(im.dtype))
        enc_vars = {"params": p["model.encoder"],
                    "batch_stats": bs["model.encoder"]}
        outs = HybridEncoder(cfg).apply(enc_vars, proj, train=False)
        return sum(o.mean() for o in outs)

    chained_time("backbone+encoder", encoder_stage, images)

    chained_time(
        "full",
        lambda im, c: model.apply(variables, im + c * 0,
                                  train=False)["logits"].mean(),
        images)


if __name__ == "__main__":
    main()
