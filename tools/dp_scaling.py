"""Data-parallel weak-scaling microbench on the virtual CPU mesh.

VERDICT r1 item 5 asked for evidence that the D-FINE train step scales
across a dp mesh now that the Hungarian host callback is gone (the
on-device Jonker-Volgenant matcher, `ops/lapjv.py`). Virtual CPU devices
share the same cores, so strong scaling is meaningless here; what this
measures is WEAK scaling: global batch = n_dev x per-device batch. If
the step is free of cross-device serialization (no host funnels, no
involuntary remats), step time should stay roughly flat as devices and
global batch grow together — each device does the same per-step work and
the only additions are the gradient psums.

Usage: python tools/dp_scaling.py [--per-dev 2] [--img 96] [--iters 5]
Prints a table + emits DP_SCALING.json.
"""

import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_step(cfg, mesh, model):
    from pautdx.losses.detr import dfine_criterion

    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("dp"))
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))

    def train_step(params, batch_stats, opt_state, images, gt_boxes,
                   gt_classes, gt_mask):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            loss, _ = dfine_criterion(out, gt_boxes, gt_classes, gt_mask,
                                      cfg.num_labels, cfg.max_num_bins)
            return loss, mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    return opt, jax.jit(
        train_step,
        in_shardings=(repl, repl, None, bsh, bsh, bsh, bsh),
        out_shardings=(repl, repl, None, repl))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-dev", type=int, default=2)
    ap.add_argument("--img", type=int, default=96)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="DP_SCALING.json")
    ap.add_argument("--devices", default="1,2,4,8",
                    help="comma list of mesh sizes; a subset run (e.g. "
                         "'1,2') merges into --out under --merge-key. "
                         "1 must be included: it is both the efficiency "
                         "base and the built-in quietness control (its "
                         "step time vs the committed quiet run's tells "
                         "whether the host was actually quiet).")
    ap.add_argument("--merge-key", default=None,
                    help="merge this run into an existing artifact under "
                         "the given key instead of overwriting it")
    args = ap.parse_args()

    from __graft_entry__ import _tiny_cfg
    from pautdx.models.vision.dfine import DFine

    cfg = _tiny_cfg()
    model = DFine(cfg)
    rows = []
    sizes = tuple(int(s) for s in args.devices.split(","))
    assert sizes[0] == 1, "--devices must start with 1 (efficiency base)"
    for n in sizes:
        devs = np.asarray(jax.devices()[:n])
        mesh = Mesh(devs, axis_names=("dp",))
        repl = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("dp"))
        B, IMG, M = n * args.per_dev, args.img, 2
        rng = np.random.default_rng(0)
        images = jax.device_put(jnp.asarray(
            rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)), bsh)
        gtb = jax.device_put(jnp.tile(jnp.asarray(
            [[[0.4, 0.4, 0.2, 0.2], [0.6, 0.6, 0.1, 0.1]]], jnp.float32),
            (B, 1, 1)), bsh)
        gtc = jax.device_put(jnp.zeros((B, M), jnp.int32), bsh)
        gtm = jax.device_put(jnp.ones((B, M), jnp.float32), bsh)

        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, IMG, IMG, 3)), train=False)
        params = jax.device_put(variables["params"], repl)
        bstats = jax.device_put(variables["batch_stats"], repl)
        opt, step = build_step(cfg, mesh, model)
        opt_state = opt.init(params)

        with mesh:
            params, bstats, opt_state, loss = step(
                params, bstats, opt_state, images, gtb, gtc, gtm)
            jax.block_until_ready(loss)                    # compile
            t0 = time.perf_counter()
            for _ in range(args.iters):
                params, bstats, opt_state, loss = step(
                    params, bstats, opt_state, images, gtb, gtc, gtm)
            jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        rows.append({"devices": n, "global_batch": B, "step_ms": round(dt, 1)})
        print(f"dp={n}  global_batch={B:2d}  step={dt:7.1f} ms", flush=True)

    base = rows[0]["step_ms"]
    for r in rows:
        r["weak_scaling_eff"] = round(base / r["step_ms"], 3)
    if args.merge_key:
        merged = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                merged = json.load(f)
        merged[args.merge_key] = rows
        with open(args.out + ".tmp", "w") as f:
            json.dump(merged, f, indent=1)
        os.replace(args.out + ".tmp", args.out)
        print(json.dumps(merged))
    else:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        print(json.dumps(rows))


if __name__ == "__main__":
    main()
