"""Accuracy-on-the-bench harness: trains D-FINE on synthetic PAUT B-scan
volumes at 640px ON THE REAL CHIP, evaluates mAP@0.5 on held-out volumes,
and cross-checks the HF-parity config through torch with the IDENTICAL
(JAX-trained, exported) weights.

Produces ``BENCH_ACCURACY.json`` tying the throughput bench (bench.py,
dfine_nano 640px) to measured detection quality:

- ``parity_small``: the HF-architecture config (hgnet stem, per-head
  deformable points, bilinear). Trained in JAX; evaluated in JAX AND in
  torch via ``compat.dfine_import.export_state_dict`` — the mAP delta IS
  the torch-parity evidence (reference oracle:
  `/root/reference/D-Fine/eval_temp_dfine.py:58-84`).
- ``nano``: the TPU serving preset (patchify stem, 150 queries, shared
  sampling points). Evaluated in its training precision AND in the exact
  serving mode bench.py times (bf16 weights + discrete sampling), so
  every nano deviation's quality cost is measured, not asserted.

Usage:  python tools/bench_accuracy.py [--steps 1200] [--batch 16]
        [--quick] [--out BENCH_ACCURACY.json]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import optax

IMG = 640
CLASS_MAP = {"Delamination": 0, "FO": 1}
NUM_LABELS = 2


def make_dataset(seeds, n_scans=60, rng_seed=0):
    """Synthetic PAUT volumes -> 640px detection frames with 1-3 random
    defects each (class, span, depth, amplitude randomized per volume)."""
    from pautdx.data import synthetic
    from pautdx.data.vision import detection_frames_from_volume
    from pautdx.data.volume import parse_json_volume

    rng = np.random.default_rng(rng_seed)
    imgs, boxes, classes, masks = [], [], [], []
    # render frames on the host CPU backend: the jit image kernels are
    # tiny, and dispatching them to the TPU through the relay is pure
    # per-op latency (dataset synth took ~30 min that way)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else _nullcontext()
    with ctx:
        return _make_dataset_inner(seeds, n_scans, rng, imgs, boxes,
                                   classes, masks)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def _make_dataset_inner(seeds, n_scans, rng, imgs, boxes, classes, masks):
    from pautdx.data import synthetic
    from pautdx.data.vision import detection_frames_from_volume
    from pautdx.data.volume import parse_json_volume

    for s in seeds:
        n_beams = int(rng.integers(6, 9))
        spec = synthetic.VolumeSpec(
            n_beams=n_beams, n_scans=n_scans, n_samples=320,
            noise=float(rng.uniform(0.02, 0.06)), seed=int(s))
        defects = []
        for _ in range(int(rng.integers(1, 4))):
            b0 = int(rng.integers(0, n_beams - 2))
            b1 = int(rng.integers(b0 + 1, n_beams))
            s0 = int(rng.integers(0, n_scans - 12))
            s1 = int(rng.integers(s0 + 6, min(s0 + 30, n_scans)))
            d0 = float(rng.uniform(0.15, 0.6))
            d1 = float(d0 + rng.uniform(0.08, 0.25))
            label = "Delamination" if rng.random() < 0.5 else "FO"
            defects.append(synthetic.SyntheticDefect(
                b0, b1, s0, s1, d0, min(d1, 0.85), label=label,
                amplitude=float(rng.uniform(0.5, 1.0))))
        vol_arr, _ = synthetic.generate_volume(spec, defects)
        vol = parse_json_volume(synthetic.volume_to_json_dict(vol_arr, defects))
        fr = detection_frames_from_volume(vol, out_size=IMG, max_boxes=8,
                                          class_map=CLASS_MAP)
        imgs.append(fr.images)
        boxes.append(fr.boxes)
        classes.append(fr.classes)
        masks.append(fr.mask)
    images = np.concatenate(imgs).astype(np.float32)
    return (images, np.concatenate(boxes), np.concatenate(classes),
            np.concatenate(masks))


def configs():
    from pautdx.models.vision.dfine import DFineConfig, dfine_nano
    from pautdx.models.vision.hgnet import HGNetConfig

    parity_small = DFineConfig(
        num_labels=NUM_LABELS, d_model=64, encoder_hidden_dim=64,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_attention_heads=4, decoder_ffn_dim=128, encoder_ffn_dim=128,
        num_queries=30, max_num_bins=16, hidden_expansion=0.5,
        lqe_hidden_dim=64,
        backbone=HGNetConfig(
            stem_channels=(3, 8, 8), stage_in_channels=(8, 16, 32, 64),
            stage_mid_channels=(8, 8, 16, 32),
            stage_out_channels=(16, 32, 64, 128),
            stage_num_blocks=(1, 1, 1, 1), stage_num_layers=(1, 1, 2, 2),
            stage_downsample=(False, True, True, True),
            stage_light_block=(False, False, True, True),
            stage_kernel_size=(3, 3, 5, 5),
        ),
    )
    return {"parity_small": parity_small,
            "nano": dfine_nano(num_labels=NUM_LABELS)}


def train(cfg, data, steps, batch, lr=2.5e-4, log_every=100,
          ema_decay=0.999):
    from pautdx.losses.detr import dfine_criterion
    from pautdx.models.vision.dfine import DFine

    images, gt_boxes, gt_classes, gt_mask = data
    n = images.shape[0]
    x1, y1, x2, y2 = [gt_boxes[..., i] for i in range(4)]
    gt_norm = np.stack([(x1 + x2) / 2 / IMG, (y1 + y2) / 2 / IMG,
                        (x2 - x1) / IMG, (y2 - y1) / IMG], -1).astype(np.float32)

    model = DFine(cfg)
    variables = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, IMG, IMG, 3)), train=False))(
            jax.random.PRNGKey(0))
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.warmup_cosine_decay_schedule(
            0.0, lr, min(100, steps // 10), steps, lr / 50),
            weight_decay=1e-4))
    opt_state = opt.init(params)

    # Dataset lives ON DEVICE; per-step input is a (batch,) index vector.
    # Re-uploading a 78 MB image batch through the axon relay every step
    # both dominated step time and leaked host memory (OOM at 130 GB on
    # the first run of this harness) — device-resident data + on-device
    # take() is also simply the right TPU input pipeline for a small set.
    images_d = jax.device_put(jnp.asarray(images))
    gtb_d = jax.device_put(jnp.asarray(gt_norm))
    gtc_d = jax.device_put(jnp.asarray(gt_classes))
    gtm_d = jax.device_put(jnp.asarray(gt_mask.astype(np.float32)))

    @jax.jit
    def step(params, batch_stats, opt_state, idx, key, images_d, gtb_d,
             gtc_d, gtm_d):
        # data tensors are explicit args (NOT closure constants: jit would
        # bake a 3 GB literal into the executable); passing device arrays
        # is pointer-cheap
        im = jnp.take(images_d, idx, axis=0)
        gtb = jnp.take(gtb_d, idx, axis=0)
        gtc = jnp.take(gtc_d, idx, axis=0)
        gtm = jnp.take(gtm_d, idx, axis=0)

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, im, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            loss, _ = dfine_criterion(out, gtb, gtc, gtm, cfg.num_labels,
                                      cfg.max_num_bins)
            return loss, mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    @jax.jit
    def ema_update(ema, params):
        return jax.tree_util.tree_map(
            lambda e, p: ema_decay * e + (1 - ema_decay) * p, ema, params)

    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    ema = params
    t0 = time.time()
    for i in range(steps):
        idx = jnp.asarray(rng.choice(n, batch, replace=False))
        key, k = jax.random.split(key)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, idx, k, images_d, gtb_d,
            gtc_d, gtm_d)
        ema = ema_update(ema, params)
        if i % log_every == 0 or i == steps - 1:
            print(f"    step {i:5d} loss {float(loss):8.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    del images_d, gtb_d, gtc_d, gtm_d
    # evaluate the EMA weights (standard DETR-family practice; smooths
    # the late-training loss spikes this objective shows at batch 16)
    return model, {"params": ema, "batch_stats": batch_stats}


def eval_jax(model, variables, data, batch=16, serving_cfg=None,
             threshold=0.05, uint8_input=False):
    """mAP@0.5 of a JAX model on (images, boxes, classes, mask).

    serving_cfg: optional DFineConfig to re-instantiate the model in a
    different inference mode (e.g. discrete sampling) — params reused.
    uint8_input: quantize frames to uint8 before upload and dequantize on
    device (the production serving contract: B-scan frames arrive as
    uint8 images, mirroring the reference's PNG pipeline).
    """
    from pautdx.eval import evaluate_map
    from pautdx.models.vision.dfine import DFine, post_process

    if serving_cfg is not None:
        model = DFine(serving_cfg)
    images, gt_boxes, gt_classes, gt_mask = data
    n = images.shape[0]

    @jax.jit
    def infer(v, data, a):
        im = jax.lax.dynamic_slice_in_dim(data, a, batch, axis=0)
        if uint8_input:
            im = im.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
        out = model.apply(v, im, train=False)
        return post_process(out["logits"], out["pred_boxes"], (IMG, IMG),
                            threshold=threshold, max_det=16)

    # one upload; per-batch slicing happens on device (see train())
    if uint8_input:
        host = np.clip(np.asarray(images) * 255.0 + 0.5, 0, 255).astype(
            np.uint8)
        data_d = jax.device_put(jnp.asarray(host))
    else:
        data_d = jax.device_put(jnp.asarray(
            images, jnp.bfloat16 if serving_cfg is not None else jnp.float32))
    preds, gts = [], []
    for a in range(0, n - n % batch, batch):
        pp = jax.device_get(infer(variables, data_d, jnp.asarray(a)))
        for i in range(batch):
            t = a + i
            v = pp["valid"][i]
            preds.append({"boxes": np.asarray(pp["boxes"][i], np.float32)[v],
                          "scores": np.asarray(pp["scores"][i], np.float32)[v],
                          "classes": pp["classes"][i][v]})
            gm = gt_mask[t] > 0
            gts.append({"boxes": gt_boxes[t][gm], "classes": gt_classes[t][gm]})
    return evaluate_map(preds, gts, num_classes=NUM_LABELS)["mAP@0.5"]


def to_bf16(variables):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)


def eval_torch_parity(cfg, variables, data, max_frames=240, threshold=0.05):
    """Export JAX weights -> torch HF D-FINE, eval mAP@0.5 on the same
    frames (CPU). Returns mAP or None if transformers lacks D-FINE."""
    try:
        import torch
        from transformers import DFineConfig as HFDFineConfig
        from transformers import HGNetV2Config
        from transformers.models.d_fine.modeling_d_fine import (
            DFineForObjectDetection,
        )
    except Exception as e:                                 # pragma: no cover
        print("    torch/transformers unavailable:", e)
        return None
    from pautdx.compat.dfine_import import (
        export_state_dict, load_torch_model_state,
    )
    from pautdx.eval import evaluate_map

    bb = cfg.backbone
    backbone = HGNetV2Config(
        stem_channels=list(bb.stem_channels),
        stage_in_channels=list(bb.stage_in_channels),
        stage_mid_channels=list(bb.stage_mid_channels),
        stage_out_channels=list(bb.stage_out_channels),
        stage_num_blocks=list(bb.stage_num_blocks),
        stage_numb_of_layers=list(bb.stage_num_layers),
        stage_downsample=list(bb.stage_downsample),
        stage_light_block=list(bb.stage_light_block),
        stage_kernel_size=list(bb.stage_kernel_size),
        use_learnable_affine_block=True,
        embedding_size=bb.stem_channels[1],
        hidden_sizes=list(bb.stage_out_channels),
        depths=[1, 1, 1, 1],
        out_features=["stage2", "stage3", "stage4"],
    )
    hf = HFDFineConfig(
        backbone_config=backbone, num_labels=cfg.num_labels,
        d_model=cfg.d_model, encoder_hidden_dim=cfg.encoder_hidden_dim,
        encoder_in_channels=list(bb.stage_out_channels[1:]),
        decoder_in_channels=[cfg.d_model] * 3,
        decoder_layers=cfg.decoder_layers,
        decoder_attention_heads=cfg.decoder_attention_heads,
        num_attention_heads=cfg.encoder_attention_heads,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        encoder_ffn_dim=cfg.encoder_ffn_dim, num_queries=cfg.num_queries,
        max_num_bins=cfg.max_num_bins, num_denoising=0,
        anchor_image_size=None, eval_size=None,
        hidden_expansion=cfg.hidden_expansion, eval_idx=-1,
    )
    tm = DFineForObjectDetection(hf).eval()
    sd = export_state_dict(jax.device_get(variables),
                           load_torch_model_state(tm))
    tm.load_state_dict({k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()})

    from pautdx.models.vision.dfine import DFine

    # Reference forward runs on the host CPU in f32: the parity claim is
    # "identical weights through torch match JAX" — apples-to-apples means
    # CPU f32 vs CPU f32. (On-TPU f32 matmuls use bf16 MXU passes by
    # default; that quality is what jax_map50 already measures.)
    jmodel = DFine(cfg)
    cpu = jax.local_devices(backend="cpu")[0]
    variables = jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a), cpu),
        jax.device_get(variables))
    _jf = jax.jit(lambda v, x: jmodel.apply(v, x, train=False))

    def jinfer(v, x):
        with jax.default_device(cpu):
            return _jf(v, jax.device_put(x, cpu))

    images, gt_boxes, gt_classes, gt_mask = data
    n = min(max_frames, images.shape[0])
    preds, gts = [], []
    max_logit_delta = max_box_delta = max_score = 0.0
    with torch.no_grad():
        for a in range(0, n, 8):
            im = torch.from_numpy(
                images[a:a + 8].transpose(0, 3, 1, 2)).float()
            out = tm(im)
            # direct output parity vs JAX on the same frames — THE parity
            # evidence (mAP equality follows from it, and a harness bug in
            # either post-processing can't mask a real model mismatch)
            jout = jinfer(variables, jnp.asarray(images[a:a + 8]))
            max_logit_delta = max(max_logit_delta, float(np.max(np.abs(
                np.asarray(jout["logits"]) - out.logits.numpy()))))
            max_box_delta = max(max_box_delta, float(np.max(np.abs(
                np.asarray(jout["pred_boxes"]) - out.pred_boxes.numpy()))))
            probs = torch.sigmoid(out.logits)
            max_score = max(max_score, float(probs.max()))
            for i in range(im.shape[0]):
                t = a + i
                p = probs[i].numpy()                      # (Q, C)
                b = out.pred_boxes[i].numpy()             # (Q, 4) cxcywh
                flat = p.reshape(-1)
                k = min(16, flat.size)
                idx = np.argpartition(-flat, k - 1)[:k]
                scores = flat[idx]
                qi, ci = idx // p.shape[1], idx % p.shape[1]
                keep = scores >= threshold
                cx, cy, w, h = [b[qi[keep], j] for j in range(4)]
                boxes = np.stack([(cx - w / 2) * IMG, (cy - h / 2) * IMG,
                                  (cx + w / 2) * IMG, (cy + h / 2) * IMG], -1)
                preds.append({"boxes": boxes, "scores": scores[keep],
                              "classes": ci[keep]})
                gm = gt_mask[t] > 0
                gts.append({"boxes": gt_boxes[t][gm],
                            "classes": gt_classes[t][gm]})
    return {"map50": evaluate_map(preds, gts,
                                  num_classes=NUM_LABELS)["mAP@0.5"],
            "max_logit_delta": max_logit_delta,
            "max_box_delta": max_box_delta,
            "max_score": max_score}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--quick", action="store_true",
                    help="tiny smoke run (CPU-able)")
    ap.add_argument("--out", default="BENCH_ACCURACY.json")
    ap.add_argument("--only", choices=["parity_small", "nano"], default=None,
                    help="run a single config (e.g. after a relay wedge "
                         "killed a full run; merge results by hand)")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pautdx_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    global IMG
    if args.quick:
        IMG = 128
        args.steps = min(args.steps, 60)

    print("dataset: synthesizing volumes ...", flush=True)
    train_data = make_dataset(range(100, 125), rng_seed=1)
    val_data = make_dataset(range(500, 504), rng_seed=2)
    print(f"  train frames {train_data[0].shape}, val {val_data[0].shape}",
          flush=True)

    results = {"img_size": IMG, "steps": args.steps, "batch": args.batch,
               "val_frames": int(val_data[0].shape[0]),
               "train_frames": int(train_data[0].shape[0]),
               "device": str(jax.devices()[0]).split(":")[0]}
    cfgs = configs()

    def dump(tag, variables):
        from pautdx.compat.dfine_import import _flatten

        flat = {}
        got = jax.device_get(variables)
        for grp in ("params", "batch_stats"):
            for k, v in _flatten(dict(got.get(grp, {}))).items():
                flat[f"{grp}:{k}"] = np.asarray(v)
        np.savez_compressed(f"/tmp/bench_acc_{tag}.npz", **flat)

    if args.only in (None, "parity_small"):
        run_parity(args, cfgs, train_data, val_data, results, dump)
    if args.only in (None, "nano"):
        run_nano(args, cfgs, train_data, val_data, results, dump)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


def run_parity(args, cfgs, train_data, val_data, results, dump):
    print("== parity_small (HF architecture) ==", flush=True)
    model, variables = train(cfgs["parity_small"], train_data, args.steps,
                             args.batch)
    dump("parity_small", variables)
    m_jax = eval_jax(model, variables, val_data)
    print(f"    JAX mAP@0.5 (f32/bilinear) = {m_jax:.4f}", flush=True)
    m_torch = eval_torch_parity(cfgs["parity_small"], variables, val_data)
    print(f"    torch parity (same weights) = {m_torch}", flush=True)
    results["parity_small"] = {"jax_map50": m_jax, "torch": m_torch}


def run_nano(args, cfgs, train_data, val_data, results, dump):
    print("== nano (TPU serving preset) ==", flush=True)
    model, variables = train(cfgs["nano"], train_data, args.steps, args.batch)
    dump("nano", variables)
    m_train = eval_jax(model, variables, val_data)
    serving = dataclasses.replace(cfgs["nano"], decoder_method="discrete")
    m_serve = eval_jax(model, to_bf16(variables), val_data,
                       serving_cfg=serving)
    m_serve_u8 = eval_jax(model, to_bf16(variables), val_data,
                          serving_cfg=serving, uint8_input=True)
    print(f"    JAX mAP@0.5 f32/bilinear = {m_train:.4f}; "
          f"serving bf16/discrete/shared = {m_serve:.4f}; "
          f"uint8-input serving = {m_serve_u8:.4f}", flush=True)
    results["nano"] = {"jax_map50_f32_bilinear": m_train,
                       "jax_map50_serving_bf16_discrete": m_serve,
                       "jax_map50_serving_uint8_input": m_serve_u8}


if __name__ == "__main__":
    main()
