"""Temporal-v2 data-scaling probe: is v2 data-hungry, as documented?

The committed v2 story (PROGRESS round 5 item 2, V2_TRAJECTORY.json) is
a measured negative with a HYPOTHESIS attached: the reference's
fresh-classifier variant (`/root/reference/D-Fine/temp_dfine_over.py:
126-285`) relearns classification from scratch from temporal features,
and 40 train sequences is enough to fine-tune deltas (v1 +0.009, v3
+0.088 — both keep the trunk classifier) but not to retrain a
classifier; the trajectory plateaus at ~0.09 mAP@0.5 vs the 0.2279
single-frame trunk, with recipe and budget ruled out.

This probe tests the remaining variable — DATA. Same val set (seeds
700-707), same frozen trunk checkpoint, same grouped-lr recipe, but the
train pool grows from 20 volumes (40 sequences) to ``--n-train``
volumes (default 60 → ~120 sequences; seeds 200..200+n, a superset of
the original 200-219). If the plateau lifts materially toward the
trunk, the data-hunger hypothesis is verified (and v2 becomes a usable
capability at sufficient data); if it stays at ~0.09 with 3x the data,
the hypothesis is refuted and the limitation is deeper than dataset
size.

Usage: python tools/v2_data_scaling.py [--n-train 60] [--steps 9000]
Writes V2_DATA_SCALING.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench_accuracy as ba


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=60)
    ap.add_argument("--steps", type=int, default=9000)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--ckpt-dir", default="/tmp/ba_temporal_ckpt")
    ap.add_argument("--out", default="V2_DATA_SCALING.json")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pautdx_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    # exact temporal-section config (bench_accuracy.run_temporal)
    ba.IMG, ba.SEQ_LEN = 320, 50
    n_scans, n_val = 60, 8

    trunk_path = os.path.join(args.ckpt_dir, "trunk_vars.pkl")
    if not os.path.exists(trunk_path):
        sys.exit("no trunk checkpoint — run bench_accuracy --only "
                 "temporal first")
    trunk_vars = ba._ckpt_load(trunk_path)

    from pautdx.models.vision.dfine import dfine_nano

    trunk_cfg = dfine_nano(num_labels=ba.NUM_LABELS)

    print(f"building temporal dataset: {args.n_train} train volumes "
          f"(3x the harness's 20), same val seeds ...", flush=True)
    train_chunks = ba.make_temporal_dataset(range(200, 200 + args.n_train),
                                            n_scans=n_scans, rng_seed=4)
    val_chunks = ba.make_temporal_dataset(range(700, 700 + n_val),
                                          n_scans=n_scans, rng_seed=5)
    print(f"  train seqs {len(train_chunks)}, val seqs {len(val_chunks)}",
          flush=True)
    tr = ba._stack_chunks(train_chunks)
    va = ba._stack_chunks(val_chunks)
    tr_d = tuple(jax.device_put(jnp.asarray(
        a, jnp.bfloat16 if i == 0 else None)) for i, a in enumerate(tr))
    del tr
    va_d = tuple(jax.device_put(jnp.asarray(
        a, jnp.bfloat16 if i == 0 else None)) for i, a in enumerate(va))
    del va

    def eval_fn(model, variables):
        return ba.eval_temporal(model, variables, va_d, val_chunks)

    _, _, traj = ba.train_temporal(
        "v2", trunk_cfg, trunk_vars, tr_d, len(train_chunks), args.steps,
        eval_every=args.eval_every, eval_fn=eval_fn)

    out = {
        "probe": "tools/v2_data_scaling.py — v2 grouped-lr recipe, "
                 f"{args.n_train}-volume train pool "
                 f"({len(train_chunks)} sequences vs the harness's 40), "
                 "mAP@0.5 every eval_every sequence-steps on the "
                 "UNCHANGED val set",
        "img_size": ba.IMG, "seq_len": ba.SEQ_LEN,
        "recipe": "classifier sched(1e-3) / temporal sched(5e-4) / "
                  "trunk frozen (the CPU-gate recipe)",
        "n_train_volumes": args.n_train,
        "n_train_seqs": len(train_chunks),
        "single_frame_map50_reference": 0.2279,
        "baseline_40seq_plateau": "~0.09 by step 3500 (V2_TRAJECTORY.json)",
        "steps": args.steps, "trajectory": traj,
    }
    with open(args.out + ".tmp", "w") as f:
        json.dump(out, f, indent=1)
    os.replace(args.out + ".tmp", args.out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
