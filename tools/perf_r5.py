"""Round-5 serving-fps probes (VERDICT r4 item 6): deeper batch sweep
(b128/b192/b256) and the input-relayout lever.

The remaining roofline gap analysis (PERF_INT8.json / PERF_SERVING_R4):
top op #1 is the dequantized bf16[B,640,640,3] image materializing in a
tiled layout before the space-to-depth fusion reads it. Round 4's
raw-uint8 fold measured NEGATIVE (6206 vs 6354) because XLA fused the
u8->bf16 convert into the stem matmul's operand load (slow convert path
on the MXU operand bus). `stem_u8_materialize` splits the difference:
s2d moves 1-byte elements, ONE convert pass writes lane-aligned bf16
patches (192 channels), the matmul reads plain bf16 — the 3-channel
640px bf16 image never exists.

Numerics are identical to the raw-u8 path (the barrier is an identity),
so the BENCH_ACCURACY raw-uint8 quality entry covers it.

Usage: python tools/perf_r5.py [--out PERF_SERVING_R5.json]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from perf_ab import measure


def _onchip_equivalence(cfg_a, cfg_b, img, batch=4):
    """On-chip equivalence of two serving configs sharing bf16 weights.

    Per-slot max deltas are the WRONG metric here: at random init the
    encoder proposal scores are near-tied, so a ~5e-4 bf16 attention
    delta reshuffles the internal top-k query selection and every
    reshuffled slot shows an O(1) logit delta while the detection SET is
    unchanged (the same mechanism as the torch-parity top-k flips,
    PROGRESS.md round 1). Measured: the kernel itself matches the XLA
    einsum at 4.9e-4 on chip at the exact serving shapes
    (B,8,400,16 bf16 — /tmp/probe_fattn.py, round 5). So compare the
    permutation-invariant output: sorted top-300 sigmoid scores."""
    import jax.numpy as jnp
    import numpy as np

    from pautdx.models.vision.dfine import DFine
    from pautdx.serve.throughput import cast_params_bf16, make_uint8_slab

    model_a, model_b = DFine(cfg_a), DFine(cfg_b)
    variables = cast_params_bf16(jax.jit(lambda k: model_a.init(
        {"params": k}, jnp.zeros((1, img, img, 3), jnp.bfloat16),
        train=False))(jax.random.PRNGKey(0)))
    x = make_uint8_slab((batch, img, img, 3), seed=3).astype(
        jnp.bfloat16) / 255.0

    def top_scores(model):
        out = jax.jit(lambda v, t: model.apply(v, t, train=False))(
            variables, x)
        probs = jax.nn.sigmoid(out["logits"].astype(jnp.float32))
        flat = probs.reshape(batch, -1)
        return jax.lax.sort(flat, dimension=-1)[:, -300:]

    sa, sb = top_scores(model_a), top_scores(model_b)
    return float(jnp.max(jnp.abs(sa - sb)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PERF_SERVING_R5.json")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batches", default="128,192,256")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pautdx_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from pautdx.models.vision.dfine import dfine_nano

    base = dataclasses.replace(dfine_nano(num_labels=2),
                               decoder_method="discrete")
    mat = dataclasses.replace(
        base, backbone=dataclasses.replace(base.backbone,
                                           stem_u8_materialize=True))
    fattn = dataclasses.replace(base, encoder_fused_attn=True)

    out = {"probe": "tools/perf_r5.py, dfine_nano discrete serving, "
                    "real v5e chip via axon relay, round 5",
           "batch_sweep_fps": {}, "u8_materialize_fps": {},
           "fused_attn_fps": {}}

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
        out["batch_sweep_fps"] = results.get("batch_sweep_fps", {})
        out["u8_materialize_fps"] = results.get("u8_materialize_fps", {})
        out["fused_attn_fps"] = results.get("fused_attn_fps", {})

    def flush():
        with open(args.out + ".tmp", "w") as f:
            json.dump(out, f, indent=1)
        os.replace(args.out + ".tmp", args.out)

    for b in (int(s) for s in args.batches.split(",")):
        key = f"b{b}"
        if key not in out["batch_sweep_fps"]:
            fps = measure(base, args.img, b)
            out["batch_sweep_fps"][key] = round(fps, 1)
            print(f"base {key}: {fps:.1f} fps", flush=True)
            flush()
        if key not in out["u8_materialize_fps"]:
            fps = measure(mat, args.img, b, raw_uint8=True)
            out["u8_materialize_fps"][key] = round(fps, 1)
            print(f"u8_materialize {key}: {fps:.1f} fps", flush=True)
            flush()
        if key not in out["fused_attn_fps"]:
            # Pallas fused AIFI attention (ops/pallas_attention): scores
            # stay in VMEM. Interpret-mode equivalence is CPU-gated
            # (test_pallas_ops.py); the REAL Mosaic lowering (N=400 is
            # not lane-aligned) is verified here on the chip before any
            # fps number is recorded (sorted-top-score metric — see
            # _onchip_equivalence for why per-slot deltas mislead).
            if "fused_attn_onchip_sorted_score_delta" not in out:
                delta = _onchip_equivalence(base, fattn, args.img)
                out["fused_attn_onchip_sorted_score_delta"] = delta
                print(f"fused_attn on-chip sorted-score |delta| = "
                      f"{delta:.2e}", flush=True)
                flush()
                assert delta < 0.02, "fused attention diverges on chip"
            fps = measure(fattn, args.img, b)
            out["fused_attn_fps"][key] = round(fps, 1)
            print(f"fused_attn {key}: {fps:.1f} fps", flush=True)
            flush()

    flush()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
