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
    ap.add_argument("--mode", choices=["bf16", "int8", "both"],
                    default="both",
                    help="run one arm per invocation when the relay is "
                         "slow; results print per-arm")
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
    from pautdx.serve.throughput import cast_params_bf16, make_uint8_slab

    variables = cast_params_bf16(variables)
    slab = make_uint8_slab(
        (args.steps, args.batch, args.img, args.img, 3))

    out = {"img": args.img, "batch": args.batch}
    print(f"slab ready {slab.shape}", flush=True)

    if args.mode in ("bf16", "both"):
        def bf16_apply(images):
            o = model.apply(variables, images, train=False)
            return o["logits"], o["pred_boxes"]

        out["fps_bf16"] = round(
            measure_fps(make_streaming_forward(bf16_apply), slab), 1)
        print(f"bf16: {out['fps_bf16']} fps", flush=True)

    if args.mode in ("int8", "both"):
        q_apply, qvars = make_quantized_apply(model, variables,
                                              min_size=args.min_size)

        def int8_apply(images):
            o = q_apply(images)
            return o["logits"], o["pred_boxes"]

        out["fps_int8_weights"] = round(
            measure_fps(make_streaming_forward(int8_apply), slab), 1)
        print(f"int8: {out['fps_int8_weights']} fps", flush=True)
        stored, dense = quantized_bytes(qvars)
        out["weight_bytes_stored"] = stored
        out["weight_bytes_bf16"] = dense
        out["bytes_ratio"] = round(stored / dense, 4)

    if "fps_bf16" in out and "fps_int8_weights" in out:
        out["speedup"] = round(out["fps_int8_weights"] / out["fps_bf16"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
