"""A/B probe: bf16 weights vs int8-weight serving throughput (D-FINE nano,
640px, streaming scan — the bench.py workload). Run on the TPU chip.

Usage: python tools/perf_int8.py [--batch 64] [--steps 8] [--img 640]
Prints one JSON line with both fps numbers and the weight-bytes ratio.
"""

import argparse
import dataclasses
import json

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--min-size", type=int, default=4096)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pautdx_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from pautdx.models.vision.dfine import DFine, dfine_nano
    from pautdx.serve.quantize import (
        make_quantized_apply, quantized_bytes, quantize_variables,
    )
    from pautdx.serve.throughput import make_streaming_forward, measure_fps

    cfg = dataclasses.replace(dfine_nano(num_labels=2),
                              decoder_method="discrete")
    model = DFine(cfg)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, args.img, args.img, 3), jnp.bfloat16),
        train=False))(jax.random.PRNGKey(0))
    variables = jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t))(variables)

    slab = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(args.steps, args.batch, args.img, args.img, 3)),
        dtype=jnp.uint8)

    def bf16_apply(images):
        out = model.apply(variables, images, train=False)
        return out["logits"], out["pred_boxes"]

    fps_bf16 = measure_fps(make_streaming_forward(bf16_apply), slab)

    q_apply, qvars = make_quantized_apply(model, variables,
                                          min_size=args.min_size)

    def int8_apply(images):
        out = q_apply(images)
        return out["logits"], out["pred_boxes"]

    fps_int8 = measure_fps(make_streaming_forward(int8_apply), slab)

    stored, dense = quantized_bytes(quantize_variables(variables,
                                                       args.min_size))
    print(json.dumps({
        "img": args.img, "batch": args.batch,
        "fps_bf16": round(fps_bf16, 1),
        "fps_int8_weights": round(fps_int8, 1),
        "speedup": round(fps_int8 / fps_bf16, 4),
        "weight_bytes_stored": stored,
        "weight_bytes_bf16": dense,
        "bytes_ratio": round(stored / dense, 4),
    }))


if __name__ == "__main__":
    main()
