"""On-chip A/B: pre-patchified uint8 wire format vs the promoted graph.

The round-5 device profile (PERF_SERVING_R5.json) left the stem's two
patch-rearrangement HBM copies as the declared top ops, each at its
relayout floor (a VMEM-resident Pallas patchify is inexpressible —
Mosaic rejects the sublane/lane-crossing shape cast). This probe removes
them from the DEVICE instead: the serving host performs the
space-to-depth permutation on the uint8 wire bytes during frame
assembly (`prepatchify_uint8`, one memcpy-speed pass over 1-byte
elements) and ships (B, H/8, W/8, 192) u8 slabs; the stem
(`HGNetConfig.stem_pre_patchified`) goes straight to the matmul.
Bit-identical outputs (tests/test_serve.py::test_prepatchified_stem_exact),
same wire bytes/frame.

Arms (both: fused AIFI attention + raw-u8 fold, the promoted bench
graph, batch 128):
  base       — (B, 640, 640, 3) u8 wire, device-side s2d transpose
  prepatch   — (B, 80, 80, 192) u8 wire, no device-side rearrangement

Also measures the HOST cost of prepatchify_uint8 per frame (numpy, this
host's single core — a production frame-assembly loop pays this where
it already touches the frame bytes).

Usage: python tools/perf_prepatch.py [batch] -> PERF_PREPATCH.json
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(cfg, slab_shape, n_calls=3):
    from pautdx.models.vision.dfine import DFine
    from pautdx.serve.throughput import (
        cast_params_bf16, fold_uint8_stem, make_streaming_forward,
        make_uint8_slab, measure_fps,
    )

    img = 640
    model = DFine(cfg)
    # init always on the image shape: params are identical between the
    # wire formats (the stem kernel keeps its (p, p, C, f) shape), so the
    # prepatch arm reuses the same init via the same seed
    init_cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
        cfg.backbone, stem_pre_patchified=False))
    variables = cast_params_bf16(jax.jit(lambda k: DFine(init_cfg).init(
        {"params": k}, jnp.zeros((1, img, img, 3), jnp.bfloat16),
        train=False))(jax.random.PRNGKey(0)))
    variables = fold_uint8_stem(variables)

    def apply_fn(images):
        out = model.apply(variables, images, train=False)
        return out["logits"], out["pred_boxes"]

    stream = make_streaming_forward(apply_fn, raw_uint8=True)
    slab = make_uint8_slab(slab_shape)
    return measure_fps(stream, slab, n_calls=n_calls)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pautdx_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from pautdx.models.vision.dfine import dfine_nano
    from pautdx.serve.throughput import prepatchify_uint8

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    img, p, n_steps = 640, 8, 8

    base = dataclasses.replace(dfine_nano(num_labels=2),
                               decoder_method="discrete",
                               encoder_fused_attn=True)
    prepatch = dataclasses.replace(base, backbone=dataclasses.replace(
        base.backbone, stem_pre_patchified=True))

    out = {"batch": batch, "img": img}
    fps = measure(base, (n_steps, batch, img, img, 3))
    out["base_raw_u8_fused"] = round(fps, 1)
    print(f"base_raw_u8_fused: {fps:.1f} fps", flush=True)

    fps = measure(prepatch, (n_steps, batch, img // p, img // p, p * p * 3))
    out["prepatch_raw_u8_fused"] = round(fps, 1)
    print(f"prepatch_raw_u8_fused: {fps:.1f} fps", flush=True)

    # host-side permutation cost (this host: 1 core; scales with cores)
    frames = np.random.default_rng(0).integers(
        0, 256, size=(batch, img, img, 3)).astype(np.uint8)
    prepatchify_uint8(frames, p)                       # warm
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        prepatchify_uint8(frames, p)
    host_ms_frame = (time.perf_counter() - t0) / (reps * batch) * 1e3
    out["host_prepatchify_ms_per_frame"] = round(host_ms_frame, 4)
    out["host_prepatchify_fps_one_core"] = round(1e3 / host_ms_frame, 1)
    print(f"host prepatchify: {host_ms_frame:.3f} ms/frame "
          f"({1e3 / host_ms_frame:.0f} fps on one host core)", flush=True)

    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PERF_PREPATCH.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
