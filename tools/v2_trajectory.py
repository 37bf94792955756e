"""Temporal-v2 budget diagnostic (VERDICT r4 item 2, second half).

Round 5's grouped-lr recipe (the one the CPU gate certifies) moved v2
from 0.0375 to only 0.0629 mAP@0.5 at 1000 sequence-steps — still far
below the 0.2279 single-frame trunk. The recipe is ruled out; the open
question is the TRAINING BUDGET: v2 (the reference's fresh-classifier
variant, `/root/reference/D-Fine/temp_dfine_over.py:126-285`) throws the
trunk's trained classifier away and relearns classification from
temporal features from scratch, while v1/v3 keep it. The trunk's own
classifier took 2000 steps x batch 16 = 32k frame-visits to train; v2's
harness budget is 1000 sequence-visits.

This probe trains v2 long (default 6000 sequence-steps) with a quality
eval every 500, reusing the temporal section's stage-checkpointed trunk
and dataset seeds, and commits the full trajectory so the committed v2
number carries its convergence story instead of a bare collapse.

Usage: python tools/v2_trajectory.py [--steps 6000] [--eval-every 500]
Writes V2_TRAJECTORY.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import bench_accuracy as ba


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--ckpt-dir", default="/tmp/ba_temporal_ckpt")
    ap.add_argument("--out", default="V2_TRAJECTORY.json")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pautdx_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    # exact temporal-section config (bench_accuracy.run_temporal)
    ba.IMG, ba.SEQ_LEN = 320, 50
    n_scans, n_train, n_val = 60, 20, 8

    trunk_path = os.path.join(args.ckpt_dir, "trunk_vars.pkl")
    if not os.path.exists(trunk_path):
        sys.exit("no trunk checkpoint — run bench_accuracy --only "
                 "temporal first")
    trunk_vars = ba._ckpt_load(trunk_path)

    from pautdx.models.vision.dfine import dfine_nano

    trunk_cfg = dfine_nano(num_labels=ba.NUM_LABELS)

    print("building temporal dataset (same seeds as the harness) ...",
          flush=True)
    train_chunks = ba.make_temporal_dataset(range(200, 200 + n_train),
                                            n_scans=n_scans, rng_seed=4)
    val_chunks = ba.make_temporal_dataset(range(700, 700 + n_val),
                                          n_scans=n_scans, rng_seed=5)
    tr = ba._stack_chunks(train_chunks)
    va = ba._stack_chunks(val_chunks)
    tr_d = tuple(jax.device_put(jnp.asarray(
        a, jnp.bfloat16 if i == 0 else None)) for i, a in enumerate(tr))
    va_d = tuple(jax.device_put(jnp.asarray(
        a, jnp.bfloat16 if i == 0 else None)) for i, a in enumerate(va))

    def eval_fn(model, variables):
        return ba.eval_temporal(model, variables, va_d, val_chunks)

    _, _, traj = ba.train_temporal(
        "v2", trunk_cfg, trunk_vars, tr_d, len(train_chunks), args.steps,
        eval_every=args.eval_every, eval_fn=eval_fn)

    out = {
        "probe": "tools/v2_trajectory.py — v2 grouped-lr recipe, long "
                 "budget, mAP@0.5 every eval_every sequence-steps",
        "img_size": ba.IMG, "seq_len": ba.SEQ_LEN,
        "recipe": "classifier sched(1e-3) / temporal sched(5e-4) / "
                  "trunk frozen (the CPU-gate recipe)",
        "single_frame_map50_reference": 0.2279,
        "steps": args.steps, "trajectory": traj,
    }
    with open(args.out + ".tmp", "w") as f:
        json.dump(out, f, indent=1)
    os.replace(args.out + ".tmp", args.out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
