"""Controlled criterion A/B for the nano quality regression (VERDICT r4
item 4 / weak #4).

Round 4's loss-stack correctness pass (detach VFL target+weight, plain
IoU instead of clipped GIoU — losses/detr.py) moved nano's measured
quality from 0.547 f32 / 0.570 serving to 0.466 / 0.467 at identical
steps/data. Two stories fit; this experiment separates them:

- arm ``legacy``: identical data/steps (3000), the PRE-fix objective
  (``dfine_criterion(legacy_vfl=True)``). If it reproduces ~0.55, the
  old numbers were real-but-shortcut-inflated (the removed gradients —
  classification target backprop into the box head, focal weight
  backprop into the scores — were doing measurable work on this task).
- arm ``fixed2x``: the fixed objective at 2x steps (6000). If quality
  recovers toward ~0.55, the reference-faithful criterion simply needs
  a longer schedule at this scale and the round-4 number undersells
  the model.

Reference loss stack being A/B'd: the VFL/GIoU/FGL weighting of
`/root/reference/D-Fine/temp_dfine_over.py:189-275` (HF detaches the
quality target: `ious.detach()`).

Writes/merges ``CRITERION_AB.json``; arms are separate invocations so a
relay wedge can't lose a finished arm:
    python tools/criterion_ab.py --arm legacy
    python tools/criterion_ab.py --arm fixed2x
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


def cached_dataset(tag, seeds, rng_seed):
    # same cache files bench_accuracy uses (same seeds/IMG/rng_seed)
    path = f"/tmp/ba_ds_{tag}_{ba.IMG}_{rng_seed}.npz"
    if os.path.exists(path):
        z = np.load(path)
        return tuple(z[k] for k in ("images", "boxes", "classes", "mask"))
    data = ba.make_dataset(seeds, rng_seed=rng_seed)
    np.savez(path + ".tmp.npz", images=data[0], boxes=data[1],
             classes=data[2], mask=data[3])
    os.replace(path + ".tmp.npz", path)
    return data


def run_arm(arm, train_data, val_data, steps):
    cfg = ba.configs()["nano"]
    legacy = arm == "legacy"
    print(f"== arm {arm}: steps={steps} legacy_vfl={legacy} ==", flush=True)
    model, variables = ba.train(cfg, train_data, steps, 16,
                                legacy_vfl=legacy)
    m_f32 = ba.eval_jax(model, variables, val_data)
    serving = dataclasses.replace(cfg, decoder_method="discrete")
    m_serve = ba.eval_jax(model, ba.to_bf16(variables), val_data,
                          serving_cfg=serving)
    print(f"    {arm}: f32 {m_f32:.4f}, serving {m_serve:.4f}", flush=True)
    return {"steps": steps, "legacy_vfl": legacy,
            "jax_map50_f32_bilinear": m_f32,
            "jax_map50_serving_bf16_discrete": m_serve}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=["legacy", "fixed2x"], required=True)
    ap.add_argument("--steps", type=int, default=None,
                    help="override (default: legacy 3000, fixed2x 6000)")
    ap.add_argument("--out", default="CRITERION_AB.json")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pautdx_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    if args.quick:
        ba.IMG = 128
        steps = args.steps or 40
        train_data = cached_dataset("abq_train", range(100, 104), 1)
        val_data = cached_dataset("abq_val", range(500, 502), 2)
    else:
        steps = args.steps or (3000 if args.arm == "legacy" else 6000)
        train_data = cached_dataset("train", range(100, 125), 1)
        val_data = cached_dataset("val", range(500, 504), 2)

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    results.setdefault("reference_points", {
        # committed history this experiment explains: identical
        # steps/data, only the criterion differs
        "prefix_r3_f32": 0.5468, "prefix_r3_serving": 0.5702,
        "fixed_r4_f32": 0.4656, "fixed_r4_serving": 0.4672,
        "steps_r3_r4": 3000,
    })
    results[args.arm] = run_arm(args.arm, train_data, val_data, steps)

    with open(args.out + ".tmp", "w") as f:
        json.dump(results, f, indent=1)
    os.replace(args.out + ".tmp", args.out)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
