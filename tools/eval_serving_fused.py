"""Quality at the EXACT round-5 benched serving mode: discrete sampling
+ Pallas fused AIFI attention (`encoder_fused_attn=True`).

bench.py promotes the fused-attention config (7284 vs 6548 fps at b128,
PERF_SERVING_R5.json), so the artifact needs the serving-mode mAP at
that graph — the repo's rule is that every benched mode carries a
measured quality number (round-4 precedent: uint8-raw / int8-acts
entries). Re-uses the trained nano weights the harness dumped
(`/tmp/bench_acc_nano.npz`) — eval only, no retraining — and merges
``jax_map50_serving_fused_attn`` into BENCH_ACCURACY.json's nano
section.

Usage: python tools/eval_serving_fused.py [--out BENCH_ACCURACY.json]
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
import jax.numpy as jnp

import bench_accuracy as ba


def load_dump(tag, model):
    """Rebuild a variables tree from the harness's flattened dump."""
    from pautdx.compat.dfine_import import _rebuild

    path = f"/tmp/bench_acc_{tag}.npz"
    z = np.load(path)
    template = jax.eval_shape(
        lambda k: model.init({"params": k},
                             jnp.zeros((1, ba.IMG, ba.IMG, 3)),
                             train=False),
        jax.random.PRNGKey(0))
    out = {}
    for grp in ("params", "batch_stats"):
        flat = {k.split(":", 1)[1]: z[k] for k in z.files
                if k.startswith(grp + ":")}
        out[grp] = _rebuild(dict(template[grp]), flat)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_ACCURACY.json")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pautdx_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from pautdx.models.vision.dfine import DFine

    cfg = ba.configs()["nano"]
    model = DFine(cfg)
    variables = load_dump("nano", model)

    z = np.load(f"/tmp/ba_ds_val_{ba.IMG}_2.npz")
    val_data = tuple(z[k] for k in ("images", "boxes", "classes", "mask"))

    serving = dataclasses.replace(cfg, decoder_method="discrete",
                                  encoder_fused_attn=True)
    m = ba.eval_jax(model, ba.to_bf16(variables), val_data,
                    serving_cfg=serving)
    print(f"serving (discrete + fused AIFI attention) mAP@0.5 = {m:.4f}",
          flush=True)
    # the round-5 bench config: raw-uint8 stem fold + fused attention
    # (raw-u8 flipped from a round-4 negative to +2.4% once the fused
    # attention changed the critical path — PERF_SERVING_R5.json
    # stem_lowering_ab_b128_fused)
    m_raw = ba.eval_jax(model, ba.to_bf16(variables), val_data,
                        serving_cfg=serving, uint8_raw=True)
    print(f"serving (raw-uint8 + fused AIFI attention) mAP@0.5 = "
          f"{m_raw:.4f}", flush=True)

    with open(args.out) as f:
        results = json.load(f)
    results["nano"]["jax_map50_serving_fused_attn"] = m
    results["nano"]["jax_map50_serving_fused_raw_u8"] = m_raw
    with open(args.out + ".tmp", "w") as f:
        json.dump(results, f, indent=1)
    os.replace(args.out + ".tmp", args.out)
    print(json.dumps(results["nano"]))


if __name__ == "__main__":
    main()
