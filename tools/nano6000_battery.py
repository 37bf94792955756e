"""nano at the 6000-step budget: full serving-mode quality battery.

The criterion A/B (CRITERION_AB.json) showed the detached-VFL objective
reaches 0.485 f32 / 0.517 serving at 6000 steps — the committed
3000-step nano section (the regression-gate budget) undersells the
model by ~0.05. This runs the longer budget once and evaluates EVERY
serving mode on those weights, including the round-5 promoted bench
graph (raw-uint8 stem fold + fused AIFI attention), merging a separate
``nano_6000`` section into BENCH_ACCURACY.json — the 3000-step section
stays as the regression gate.

Usage: python tools/nano6000_battery.py [--steps 6000]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

import bench_accuracy as ba
from criterion_ab import cached_dataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--out", default="BENCH_ACCURACY.json")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pautdx_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    train_data = cached_dataset("train", range(100, 125), 1)
    val_data = cached_dataset("val", range(500, 504), 2)

    cfg = ba.configs()["nano"]
    print(f"== nano_6000: training {args.steps} steps ==", flush=True)
    model, variables = ba.train(cfg, train_data, args.steps, 16)

    entry = {"steps": args.steps}

    def record(key, **kw):
        m = ba.eval_jax(model, ba.to_bf16(variables), val_data, **kw)
        entry[key] = m
        print(f"    {key} = {m:.4f}", flush=True)
        with open(args.out) as f:
            results = json.load(f)
        results["nano_6000"] = entry
        with open(args.out + ".tmp", "w") as f:
            json.dump(results, f, indent=1)
        os.replace(args.out + ".tmp", args.out)

    m_f32 = ba.eval_jax(model, variables, val_data)
    entry["jax_map50_f32_bilinear"] = m_f32
    print(f"    jax_map50_f32_bilinear = {m_f32:.4f}", flush=True)

    serving = dataclasses.replace(cfg, decoder_method="discrete")
    fused = dataclasses.replace(serving, encoder_fused_attn=True)
    record("jax_map50_serving_bf16_discrete", serving_cfg=serving)
    record("jax_map50_serving_uint8_input", serving_cfg=serving,
           uint8_input=True)
    # THE benched graph (bench.py round 5): raw-u8 fold + fused attn
    record("jax_map50_serving_fused_raw_u8", serving_cfg=fused,
           uint8_raw=True)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
