"""Re-measure the temporal serving fps under the round-5 promoted
serving graph (discrete + fused AIFI attention in the trunk encoder —
`bench_accuracy.measure_temporal_serving_fps` now builds that config).

Updates BENCH_ACCURACY.json's temporal section (and the stage-state
cache, so a future `--only temporal` rerun doesn't resurrect the
pre-fused number). The committed 5,078 fps was the einsum-attention
config; this records the fused capability next to it.

Usage: python tools/remeasure_temporal_fps.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench_accuracy as ba


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pautdx_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from pautdx.models.vision.dfine import dfine_nano

    ba.SEQ_LEN = 50
    trunk_cfg = dfine_nano(num_labels=ba.NUM_LABELS)
    fps_stream, fps_runner = ba.measure_temporal_serving_fps(trunk_cfg)
    print(f"fused temporal serving: stream {fps_stream:.1f}, "
          f"runner {fps_runner:.2f}", flush=True)

    out = "BENCH_ACCURACY.json"
    with open(out) as f:
        results = json.load(f)
    t = results["temporal"]
    t["serving_fps_640_stream_fused_attn"] = round(fps_stream, 2)
    t["serving_fps_640_chunked_runner_fused_attn"] = round(fps_runner, 2)
    with open(out + ".tmp", "w") as f:
        json.dump(results, f, indent=1)
    os.replace(out + ".tmp", out)

    # keep the stage cache consistent for future --only temporal reruns
    state_path = "/tmp/ba_temporal_ckpt/temporal_state.json"
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)
        state["serving_fps_640_stream_fused_attn"] = round(fps_stream, 2)
        state["serving_fps_640_chunked_runner_fused_attn"] = round(
            fps_runner, 2)
        with open(state_path + ".tmp", "w") as f:
            json.dump(state, f)
        os.replace(state_path + ".tmp", state_path)

    print(json.dumps({k: v for k, v in t.items() if "fps" in k}))


if __name__ == "__main__":
    main()
