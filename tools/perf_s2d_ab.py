"""Round-5 stem-lowering A/B at the fused-attention serving config.

After the fused AIFI attention landed (7284 fps at b128,
PERF_SERVING_R5.json), the device profile's top two ops are BOTH stem
patchify layout copies: the (B,80,80,8,8,3) patch rearrangement
(1.36 ms/iter at b32) and the (B,640,640,3) input relayout (0.85 ms) —
the image crosses HBM ~7x between dequant and the stem matmul. A
VMEM-resident Pallas patchify is not expressible (Mosaic rejects the
sublane/lane-crossing reshape — see HGNetConfig.stem_s2d_impl), so this
probe A/Bs the XLA-level lowerings of the same math:

  s2d_transpose  reshape/transpose/reshape (the current default)
  s2d_slices     64 strided views concatenated on channels
  conv           plain k8/s8 patchify conv (stem_s2d=False)
  raw_u8         round-4's raw-uint8 stem fold, re-tested UNDER the
                 fused-attn config (lever interactions are real: the
                 b128 sweep itself only paid after other levers landed)

All arms share params bit-identically (test_misc_units gates the
lowering equivalences). Usage: python tools/perf_s2d_ab.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from perf_ab import measure


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pautdx_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from pautdx.models.vision.dfine import dfine_nano

    img, batch = 640, 128
    base = dataclasses.replace(dfine_nano(num_labels=2),
                               decoder_method="discrete",
                               encoder_fused_attn=True)
    arms = {
        "s2d_transpose": (base, {}),
        "s2d_slices": (dataclasses.replace(
            base, backbone=dataclasses.replace(
                base.backbone, stem_s2d_impl="slices")), {}),
        "conv": (dataclasses.replace(
            base, backbone=dataclasses.replace(
                base.backbone, stem_s2d=False)), {}),
        "raw_u8": (base, {"raw_uint8": True}),
    }

    out_path = "PERF_SERVING_R5.json"
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    stem_ab = results.setdefault("stem_lowering_ab_b128_fused", {})

    for name, (cfg, kw) in arms.items():
        if name in stem_ab:
            continue
        fps = measure(cfg, img, batch, **kw)
        stem_ab[name] = round(fps, 1)
        print(f"{name}: {fps:.1f} fps", flush=True)
        with open(out_path + ".tmp", "w") as f:
            json.dump(results, f, indent=1)
        os.replace(out_path + ".tmp", out_path)

    print(json.dumps(stem_ab))


if __name__ == "__main__":
    main()
