"""Capture an on-device profile of the D-FINE forward and summarize the
top XLA ops by device time (parses the xplane proto directly — works
even when TensorBoard isn't usable)."""

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def summarize(trace_dir: str, top: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")))
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        per_line = {}
        for line in p.lines:
            total = collections.Counter()
            for ev in line.events:
                md = p.event_metadata[ev.metadata_id]
                total[md.name] += ev.duration_ps / 1e9
            per_line[line.name] = total
        ops = per_line.get("XLA Ops", collections.Counter())
        print(f"== {p.name} | XLA Ops total {sum(ops.values()):.1f} ms")
        for name, ms in ops.most_common(top):
            print(f"  {ms:8.2f} ms  {name[:110]}")
        mods = per_line.get("XLA Modules", collections.Counter())
        for name, ms in mods.most_common(5):
            print(f"module {ms:8.2f} ms  {name[:80]}")


def main():
    img = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    method = sys.argv[3] if len(sys.argv) > 3 else "discrete"
    modes = sys.argv[4].split("+") if len(sys.argv) > 4 else []
    fused = "fused" in modes
    raw_u8 = "rawu8" in modes
    # "prepatch": host-side space-to-depth wire format — the input ships
    # already patchified, (B, img/8, img/8, 192); the stem's device-side
    # rearrangement (the round-5 top two ops) never runs (PERF_PREPATCH)
    prepatch = "prepatch" in modes
    import dataclasses

    from pautdx.models.vision.dfine import DFine, dfine_nano

    cfg = dataclasses.replace(dfine_nano(num_labels=2),
                              decoder_method=method,
                              encoder_fused_attn=fused)
    if prepatch:
        cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
            cfg.backbone, stem_pre_patchified=True))
    model = DFine(cfg)
    init_cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
        cfg.backbone, stem_pre_patchified=False))
    init_fn = jax.jit(lambda k: DFine(init_cfg).init(
        {"params": k}, jnp.zeros((1, img, img, 3), jnp.bfloat16),
        train=False))
    variables = init_fn(jax.random.PRNGKey(0))
    variables = jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t))(variables)
    in_shape = ((batch, img // 8, img // 8, 192) if prepatch
                else (batch, img, img, 3))
    if raw_u8:
        from pautdx.serve.throughput import fold_uint8_stem

        variables = fold_uint8_stem(variables)
        images = jnp.asarray(np.random.default_rng(0).integers(
            0, 256, size=in_shape), dtype=jnp.uint8)
    else:
        images = jnp.asarray(
            np.random.default_rng(0).normal(size=in_shape),
            dtype=jnp.bfloat16)

    def chain_in(im, c):
        # carry-dependency injection that preserves the input dtype
        # (raw-u8 must reach the model as integers for the folded stem)
        if jnp.issubdtype(im.dtype, jnp.integer):
            return im ^ (c * 0).astype(im.dtype)
        return im + c * 0

    f = jax.jit(lambda v, im, c: model.apply(
        v, chain_in(im, c), train=False)["logits"].astype(
            jnp.float32).mean())
    c = jnp.zeros((), jnp.bfloat16)
    c = f(variables, images, c)
    float(c)
    trace_dir = "/tmp/pautdx_device_trace"
    jax.profiler.start_trace(trace_dir)
    for _ in range(2):
        c = f(variables, images, c)
    float(c)
    jax.profiler.stop_trace()
    summarize(trace_dir)


if __name__ == "__main__":
    main()
