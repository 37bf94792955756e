"""MFU accounting for the serving bench (VERDICT r2 item 5).

Estimates FLOPs/frame of the bench.py workload via XLA cost analysis,
derives MFU against the chip's peak, and lists the top ops by estimated
cost so "fast" is judged against the hardware ceiling rather than only
the 5k-fps target.

Usage: python tools/mfu_probe.py [--img 640] [--batch 64] [--peak-tflops 394]
(v5e peak: 394 TFLOP/s int8, 197 TFLOP/s bf16 — pass --peak-tflops 197
for the bf16 ceiling.)
Prints one JSON line.
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
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak in TFLOP/s for the compute dtype "
                         "(v5e bf16: 197)")
    ap.add_argument("--fused", action="store_true",
                    help="encoder_fused_attn serving config (round 5)")
    ap.add_argument("--fps", type=float, default=None,
                    help="measured frames/sec/chip (bench.py); if absent "
                         "only FLOPs/frame is reported")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pautdx_jax_cache_tpu")
    except Exception:
        pass

    from pautdx.models.vision.dfine import DFine, dfine_nano

    cfg = dataclasses.replace(dfine_nano(num_labels=2),
                              decoder_method="discrete",
                              encoder_fused_attn=args.fused)
    model = DFine(cfg)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, args.img, args.img, 3), jnp.bfloat16),
        train=False))(jax.random.PRNGKey(0))
    variables = jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t))(variables)

    @jax.jit
    def fwd(images):
        out = model.apply(variables, images, train=False)
        return out["logits"], out["pred_boxes"]

    x = jnp.zeros((args.batch, args.img, args.img, 3), jnp.bfloat16)
    lowered = fwd.lower(x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops_total = float(cost.get("flops", float("nan")))
    bytes_total = float(cost.get("bytes accessed", float("nan")))
    flops_frame = flops_total / args.batch
    bytes_frame = bytes_total / args.batch

    out = {
        "img": args.img, "batch": args.batch,
        "gflops_per_frame": round(flops_frame / 1e9, 3),
        "mb_accessed_per_frame": round(bytes_frame / 1e6, 3),
        "arithmetic_intensity_flops_per_byte": round(
            flops_frame / bytes_frame, 2) if bytes_frame else None,
        "peak_tflops_assumed": args.peak_tflops,
    }
    if args.fps:
        achieved = args.fps * flops_frame
        out["fps"] = args.fps
        out["achieved_tflops"] = round(achieved / 1e12, 3)
        out["mfu"] = round(achieved / (args.peak_tflops * 1e12), 4)
        # HBM-bound check: v5e ~819 GB/s
        out["achieved_gbps"] = round(args.fps * bytes_frame / 1e9, 1)
        out["hbm_utilization_vs_819gbps"] = round(
            args.fps * bytes_frame / 819e9, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
