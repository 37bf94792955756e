"""Round-5 final lever-interaction sweep at the promoted serving config
(raw-uint8 stem fold + Pallas fused AIFI attention, b128).

The raw-u8 flip (round-4 negative -> +2.4% once fused attention moved
the critical path) says interactions are real, so the two remaining
measured negatives get one re-test under the final config:

  int8_acts   activation-int8 convs (round-4: -0.3% at the bf16 config)
  batch       b96/b160/b192 around the b128 optimum (the optimum can
              shift when per-iter fixed costs change)

Merges into PERF_SERVING_R5.json. Usage: python tools/perf_final_sweep.py
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

    img = 640
    cfg = dataclasses.replace(dfine_nano(num_labels=2),
                              decoder_method="discrete",
                              encoder_fused_attn=True)

    out_path = "PERF_SERVING_R5.json"
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    sweep = results.setdefault("final_sweep_raw_u8_fused", {})

    def flush():
        with open(out_path + ".tmp", "w") as f:
            json.dump(results, f, indent=1)
        os.replace(out_path + ".tmp", out_path)

    arms = [
        ("int8_acts_b128", dict(batch=128, raw_uint8=True, int8_acts=True)),
        ("b96", dict(batch=96, raw_uint8=True)),
        ("b160", dict(batch=160, raw_uint8=True)),
        ("b192", dict(batch=192, raw_uint8=True)),
    ]
    for name, kw in arms:
        if name in sweep:
            continue
        batch = kw.pop("batch")
        fps = measure(cfg, img, batch, **kw)
        sweep[name] = round(fps, 1)
        print(f"{name}: {fps:.1f} fps", flush=True)
        flush()

    print(json.dumps(sweep))


if __name__ == "__main__":
    main()
