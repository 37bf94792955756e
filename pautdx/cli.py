"""pautdx command-line interface.

One CLI replaces the reference's per-task scripts (SURVEY.md §1 L4/L5):

- ``build-dataset``   raw txt-tree / JSON volumes -> rendered B-scans +
                      annotations.json (+ optional YOLO export)
                      (~ `DS_preprocessing.py` + `yolo_ds_preprocess.py`)
- ``train-signal``    train a signal-zoo model with a named recipe
                      (~ `train_detection.py`, `training.py`, ...)
- ``eval-signal``     checkpoint -> metrics artifacts
                      (~ `acc_metrics_hybrid_binary_dynamic_.py`)
- ``predict-signal``  JSON volumes -> predictions.json + optional heatmap
                      (~ `predict.py`, `GNN_testing_multi_v2_MAP.py`)
- ``bridge``          stdin/stdout JSON serving (~ `predict_sequence.py`)
- ``bench``           inference throughput microbenchmarks

All hyperparameters default to the reference's canonical values
(`pautdx.train.recipes`).
"""

from __future__ import annotations

import argparse
import json
import os


def _cmd_build_dataset(args) -> None:
    import numpy as np

    from pautdx.data.annotations import (
        prepare_yolo_split, save_annotations, write_yolo_dataset,
    )
    from pautdx.data.bscan import render_volume_dataset
    from pautdx.data.volume import parse_json_volume, parse_txt_tree

    os.makedirs(args.out, exist_ok=True)
    annotations = {}
    images = {}
    entries = sorted(os.listdir(args.data))
    for entry in entries:
        path = os.path.join(args.data, entry)
        if entry.endswith(".json"):
            vol = parse_json_volume(path)
            seq = entry[:-5]
        elif os.path.isdir(path):
            vol = parse_txt_tree(args.data, entry)
            seq = entry
        else:
            continue
        imgs, ann = render_volume_dataset(vol, args.size, args.size)
        annotations[seq] = ann
        seq_dir = os.path.join(args.out, seq)
        os.makedirs(seq_dir, exist_ok=True)
        for t in range(imgs.shape[0]):
            np.save(os.path.join(seq_dir, f"{t}.npy"), imgs[t])
            images[f"{seq}/{t}.png"] = imgs[t]
    save_annotations(os.path.join(args.out, "annotations.json"), annotations)
    print(f"wrote {len(annotations)} sequences to {args.out}")
    if args.yolo:
        examples = prepare_yolo_split(annotations, (args.size, args.size),
                                      keep_empty_fraction=args.keep_empty)
        yaml = write_yolo_dataset(examples, images,
                                  os.path.join(args.out, "yolo"))
        print(f"YOLO dataset: {yaml}")


def _cmd_train_signal(args) -> None:
    from pautdx.data.datasets import (
        BatchIterator, defect_focused, load_json_dir, train_val_split,
    )
    from pautdx.mesh import make_mesh
    from pautdx.models.signal.detection_zoo import MODEL_ZOO
    from pautdx.train import ReduceLROnPlateau, Trainer, make_optimizer
    from pautdx.train.recipes import RECIPES

    recipe = RECIPES[args.recipe]
    ds = load_json_dir(args.data, seq_len=args.seq_len or recipe.seq_len)
    if args.defect_focused:
        ds = defect_focused(ds)
    train_ds, val_ds = train_val_split(ds)
    model = MODEL_ZOO[args.model]()
    opt = make_optimizer(recipe.learning_rate, recipe.weight_decay,
                         recipe.clip_norm)
    mesh = make_mesh() if args.dp else None
    trainer = Trainer(model, recipe.make_objective(), opt, mesh=mesh,
                      checkpoint_dir=args.out)
    bs = args.batch_size or recipe.batch_size
    state = trainer.init(next(iter(BatchIterator(train_ds, bs))))
    trainer.fit(
        state,
        lambda: BatchIterator(train_ds, bs, seed=1),
        lambda: BatchIterator(val_ds, bs, shuffle=False,
                              drop_remainder=False),
        epochs=args.epochs or recipe.epochs,
        plateau=(ReduceLROnPlateau(patience=recipe.plateau_patience)
                 if recipe.scheduler == "plateau" else None),
        early_stop_patience=recipe.early_stop_patience,
        metadata={"model": args.model, "recipe": args.recipe,
                  "seq_len": args.seq_len or recipe.seq_len},
    )
    from pautdx.viz import plot_training_history
    plot_training_history(trainer.history,
                          os.path.join(args.out, "history.png"))
    print(f"checkpoints + history in {args.out}")


def _load_signal_model(ckpt_dir: str):
    import jax
    import numpy as np

    from pautdx.models.signal.detection_zoo import MODEL_ZOO
    from pautdx.train import CheckpointManager

    ckpt = CheckpointManager(ckpt_dir)
    state, meta = ckpt.restore("best" if "best" in ckpt._markers()
                               else "latest")
    model = MODEL_ZOO[meta["model"]]()
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    @jax.jit
    def predict(signals):
        return model.apply(variables, signals, train=False)

    return predict, meta


def _cmd_eval_signal(args) -> None:
    from pautdx.data.datasets import load_json_dir
    from pautdx.eval.report import SignalEvaluator

    predict, meta = _load_signal_model(args.checkpoint)
    ds = load_json_dir(args.data, seq_len=meta.get("seq_len", 50))
    report = SignalEvaluator(predict, threshold=args.threshold).run(
        ds, out_dir=args.out)
    print(json.dumps(report, indent=1))


def _cmd_predict_signal(args) -> None:
    import numpy as np

    from pautdx.data.volume import parse_json_volume
    from pautdx.eval.report import prediction_map

    predict, meta = _load_signal_model(args.checkpoint)
    os.makedirs(args.out, exist_ok=True)
    results = {}
    for fn in sorted(os.listdir(args.data)):
        if not fn.endswith(".json"):
            continue
        vol = parse_json_volume(os.path.join(args.data, fn))
        heat = prediction_map(predict, vol, meta.get("seq_len", 50))
        results[fn] = {
            "beams": vol.beam_keys,
            "probabilities": np.nan_to_num(heat).tolist(),
        }
        if args.heatmaps:
            from pautdx.viz import plot_prediction_heatmap
            plot_prediction_heatmap(
                heat, os.path.join(args.out, fn.replace(".json", ".png")))
    with open(os.path.join(args.out, "predictions.json"), "w") as f:
        json.dump(results, f)
    print(f"predictions for {len(results)} volumes in {args.out}")


def _cmd_train_bscan(args) -> None:
    """Train a B-scan detector (YOLO or D-FINE) from raw volumes
    (~ `yolo5s_retrain.py` / the temporal_dfine training loops)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pautdx.data.augment_vision import augment_detection_batch
    from pautdx.data.vision import batch_frames, detection_frames_from_volume, split_frames
    from pautdx.data.volume import parse_json_volume, parse_txt_tree
    from pautdx.train import Trainer, make_optimizer

    frames_list = []
    for entry in sorted(os.listdir(args.data)):
        path = os.path.join(args.data, entry)
        if entry.endswith(".json"):
            vol = parse_json_volume(path)
        elif os.path.isdir(path):
            vol = parse_txt_tree(args.data, entry)
        else:
            continue
        frames_list.extend(split_frames(detection_frames_from_volume(
            vol, out_size=args.size, max_boxes=args.max_boxes)))
    print(f"{len(frames_list)} frames")
    rng = np.random.default_rng(0)

    if args.detector == "yolo":
        from pautdx.losses.yolo import yolo_loss
        from pautdx.models.vision import YOLO, YoloConfig

        cfg = YoloConfig(num_classes=args.num_classes, scale=args.scale,
                         flavour=args.flavour)
        model = YOLO(cfg)

        def objective(out, batch):
            return yolo_loss(out, batch["boxes"], batch["classes"],
                             batch["mask"], cfg, (args.size, args.size))
    else:
        from pautdx.losses.detr import dfine_criterion
        from pautdx.models.vision.dfine import DFine, dfine_nano

        cfg = dfine_nano(num_labels=args.num_classes)
        model = DFine(cfg)

        def objective(out, batch):
            boxes = batch["boxes"] / args.size
            cx = (boxes[..., 0] + boxes[..., 2]) / 2
            cy = (boxes[..., 1] + boxes[..., 3]) / 2
            w = boxes[..., 2] - boxes[..., 0]
            h = boxes[..., 3] - boxes[..., 1]
            cxcywh = jnp.stack([cx, cy, w, h], -1)
            return dfine_criterion(out, cxcywh, batch["classes"],
                                   batch["mask"], cfg.num_labels,
                                   cfg.max_num_bins)

    def batches():
        order = rng.permutation(len(frames_list))
        bs = args.batch_size
        for i in range(len(frames_list) // bs):
            batch = batch_frames(frames_list, order[i * bs:(i + 1) * bs])
            if args.augment:
                batch = augment_detection_batch(batch, rng)
            yield batch

    trainer = Trainer(model, objective, make_optimizer(args.lr),
                      checkpoint_dir=args.out, input_key="images")
    state = trainer.init(next(iter(batches())))
    for epoch in range(args.epochs):
        state, metrics = trainer.train_epoch(state, batches())
        print(f"[epoch {epoch}] " + " ".join(
            f"{k}={v:.4f}" for k, v in metrics.items()))
        meta = {"detector": args.detector, "num_classes": args.num_classes,
                "size": args.size, "scale": args.scale,
                "flavour": args.flavour}
        if args.detector == "dfine":
            from pautdx.models.vision.dfine import config_to_dict
            meta["dfine_config"] = config_to_dict(cfg)
        trainer.ckpt.save(epoch, jax.device_get(state), metadata=meta,
                          history={k: [v] for k, v in metrics.items()},
                          is_best=True)
    print(f"checkpoints in {args.out}")


def _build_detector_forward(detector: str, num_classes: int, scale: str,
                            size: int, checkpoint, threshold: float,
                            flavour: str = "v8", quant: str = "none",
                            fused_attn: bool = False,
                            prepatch: bool = False):
    """Jitted detector forward: images (T, H, W, 3) -> fixed-size
    detections {boxes, scores, classes, valid}. Shared by predict-bscan
    and inspect.

    ``quant="int8"``: activation-int8 serving — backbone/neck convs run
    s8 x s8 -> s32 on the MXU with int8 inter-conv tensors in HBM
    (`pautdx.ops.qconv`). Conv-input scales are calibrated lazily on the
    FIRST request's frames (representative by construction: calibration
    data and serving data are the same stream), then reused.

    ``fused_attn``: D-FINE only — Pallas fused AIFI attention
    (`pautdx.ops.pallas_attention`; +11% serving fps on TPU,
    PERF_SERVING_R5.json). Param-free graph change, so any checkpoint
    loads; off by default because the interpret-mode fallback on
    non-TPU hosts is slower than the XLA einsum.

    ``prepatch``: D-FINE s2d stems only — host-side space-to-depth wire
    format (`serve.throughput.prepatchify_uint8`): frames are permuted
    on the host and the device stem skips its patch-rearrangement HBM
    copies (+12.7% serving fps on TPU, PERF_PREPATCH.json).
    Bit-identical detections, so any checkpoint loads."""
    import jax
    import jax.numpy as jnp

    # restore first: checkpoint metadata carries the exact architecture
    # (preset defaults can evolve; old checkpoints must stay loadable)
    state, meta = None, {}
    if checkpoint:
        from pautdx.train import CheckpointManager
        state, meta = CheckpointManager(checkpoint).restore("latest")
        if meta.get("size") and int(meta["size"]) != int(size):
            print(f"warning: checkpoint was trained at --size {meta['size']} "
                  f"but inference runs at --size {size}; detections may "
                  f"degrade from the resolution mismatch")

    if detector == "yolo":
        from pautdx.models.vision import YOLO, YoloConfig, decode_boxes
        from pautdx.ops import dense_to_detections

        cfg = YoloConfig(num_classes=meta.get("num_classes", num_classes),
                         scale=meta.get("scale", scale),
                         flavour=meta.get("flavour", flavour))
        model = YOLO(cfg)
    else:
        from pautdx.models.vision.dfine import (
            DFine, config_from_dict, dfine_nano,
        )

        if meta.get("dfine_config"):
            cfg = config_from_dict(meta["dfine_config"])
        else:
            # legacy checkpoint without a persisted config: pin the
            # numerics the old preset trained with (exact-erf AIFI gelu;
            # today's dfine_nano default is tanh) so restored detections
            # match training. The s2d stem lowering is bit-identical and
            # param-compatible, so it needs no pin.
            import dataclasses as _dc

            cfg = _dc.replace(
                dfine_nano(num_labels=meta.get("num_classes", num_classes)),
                encoder_act_approx=False)
        if fused_attn:
            import dataclasses as _dcf

            cfg = _dcf.replace(cfg, encoder_fused_attn=True)
        if prepatch:
            import dataclasses as _dcp

            if not cfg.backbone.stem_s2d:
                raise SystemExit(
                    "--prepatch requires a space-to-depth stem (this "
                    "checkpoint's config has stem_s2d=False)")
            cfg = _dcp.replace(cfg, backbone=_dcp.replace(
                cfg.backbone, stem_pre_patchified=True))
        model = DFine(cfg)
    if prepatch and detector != "dfine":
        raise SystemExit("--prepatch is a D-FINE wire-format option")
    patch = 8 if (detector == "dfine" and cfg.backbone.stem == "patchify8") \
        else 4
    if state is not None:
        variables = {"params": state["params"],
                     "batch_stats": state.get("batch_stats", {})}
    else:
        init_shape = ((1, size // patch, size // patch, patch * patch * 3)
                      if prepatch else (1, size, size, 3))
        init = jax.jit(lambda k: model.init(
            {"params": k}, jnp.zeros(init_shape), train=False))
        variables = init(jax.random.PRNGKey(0))

    if detector == "yolo":
        def _head(vs, images):
            out = model.apply(vs, images, train=False)
            d = decode_boxes(out, (size, size), cfg)
            return dense_to_detections(d, score_threshold=threshold,
                                       top_k=64, max_det=16)
    else:
        from pautdx.models.vision.dfine import post_process

        def _head(vs, images):
            out = model.apply(vs, images, train=False)
            return post_process(out["logits"], out["pred_boxes"],
                                (size, size), threshold=threshold,
                                max_det=16)

    if quant == "int8":
        from pautdx.serve.quantize import calibrate_int8

        cell = {}

        def forward(images):
            if "vars" not in cell:
                calib_fn = jax.jit(lambda b: model.apply(
                    variables, b, train=False, mutable=["calib"]))
                q = calibrate_int8(calib_fn, [images])
                cell["vars"] = {**dict(variables), "quant": q}
                cell["fwd"] = jax.jit(lambda im: _head(cell["vars"], im))
            return cell["fwd"](images)
    else:
        forward = jax.jit(lambda images: _head(variables, images))
    if prepatch:
        from pautdx.serve.throughput import prepatchify_uint8

        inner = forward

        def forward(images):
            import numpy as _np

            return inner(jnp.asarray(
                prepatchify_uint8(_np.asarray(images), patch)))
    return forward


def _iter_volumes(data_dir: str):
    """Yield (sequence_name, ParsedVolume) for every JSON volume / txt
    tree under ``data_dir``."""
    from pautdx.data.volume import parse_json_volume, parse_txt_tree

    for entry in sorted(os.listdir(data_dir)):
        path = os.path.join(data_dir, entry)
        if entry.endswith(".json"):
            yield entry[:-5], parse_json_volume(path)
        elif os.path.isdir(path):
            yield entry, parse_txt_tree(data_dir, entry)


def _cmd_predict_bscan(args) -> None:
    """Folder batch predict on rendered B-scans with a fresh or restored
    detector (~ `yolo/yolo_folder_eval.py`, `eval_temp_dfine.py`)."""
    import numpy as np
    import jax.numpy as jnp

    from pautdx.data.bscan import render_volume_dataset
    from pautdx.data.volume import parse_json_volume, parse_txt_tree

    os.makedirs(args.out, exist_ok=True)
    forward = _build_detector_forward(args.detector, args.num_classes,
                                      args.scale, args.size,
                                      args.checkpoint, args.threshold,
                                      flavour=args.flavour,
                                      quant=getattr(args, "quant", "none"),
                                      fused_attn=getattr(args, "fused_attn",
                                                         False),
                                      prepatch=getattr(args, "prepatch",
                                                       False))
    results = {}
    for entry in sorted(os.listdir(args.data)):
        path = os.path.join(args.data, entry)
        if entry.endswith(".json"):
            vol = parse_json_volume(path)
            seq = entry[:-5]
        elif os.path.isdir(path):
            vol = parse_txt_tree(args.data, entry)
            seq = entry
        else:
            continue
        imgs, _ = render_volume_dataset(vol, args.size, args.size)
        frames = np.repeat(imgs[..., None], 3, axis=-1).astype(np.float32)
        det = forward(jnp.asarray(frames))
        seq_out = []
        for t in range(frames.shape[0]):
            valid = np.asarray(det["valid"][t])
            seq_out.append([
                {"box": [float(v) for v in np.asarray(det["boxes"][t][i])],
                 "label": int(det["classes"][t][i]),
                 "score": float(det["scores"][t][i])}
                for i in np.nonzero(valid)[0]])
        results[seq] = seq_out
        if args.overlays:
            from pautdx.viz import draw_boxes_on_image
            t_best = int(np.argmax([len(s) for s in seq_out]))
            boxes = [d["box"] for d in seq_out[t_best]]
            draw_boxes_on_image(imgs[t_best], boxes,
                                os.path.join(args.out, f"{seq}_{t_best}.png"),
                                scores=[d["score"] for d in seq_out[t_best]])
    with open(os.path.join(args.out, "detections.json"), "w") as f:
        json.dump(results, f)
    print(f"detections for {len(results)} sequences in {args.out}")


def _cmd_explain(args) -> None:
    """Animated HTML explainers of the PAUT pipeline — the reference's
    manim video suite (`visualization/README.md`) re-rendered as
    dependency-free browser animations (`pautdx.viz.explain`)."""
    from pautdx.viz.explain import build_explainers

    for p in build_explainers(args.out):
        print(p)


def _cmd_inspect(args) -> None:
    """Interactive HTML inspector — the reference's PyQt6 QA apps
    (`display_defects.py`, `signal_visualizer.py`, `model_tester.py`)
    as a single self-contained browser page (headless-friendly)."""
    import numpy as np

    if args.mode == "bscan":
        import jax.numpy as jnp

        from pautdx.data.bscan import render_volume_dataset
        from pautdx.viz.inspect import build_bscan_inspector

        forward = None
        if args.checkpoint:
            forward = _build_detector_forward(
                args.detector, args.num_classes, args.scale, args.size,
                args.checkpoint, args.threshold, flavour=args.flavour)
        sequences = []
        for seq, vol in _iter_volumes(args.data):
            imgs, ann = render_volume_dataset(vol, args.size, args.size)
            gt = []
            for t in range(imgs.shape[0]):
                from pautdx.data.bscan import bbox_xyxy_from_schema
                gt.append([
                    {"box": list(bbox_xyxy_from_schema(d["bbox"])),
                     "label": d["label"]}
                    for d in ann.get(f"{t}.png", [])])
            pred = None
            if forward is not None:
                frames = np.repeat(
                    imgs[..., None], 3, axis=-1).astype(np.float32)
                det = forward(jnp.asarray(frames))
                pred = []
                for t in range(imgs.shape[0]):
                    valid = np.nonzero(np.asarray(det["valid"][t]))[0]
                    pred.append([
                        {"box": [float(v)
                                 for v in np.asarray(det["boxes"][t][i])],
                         "label": int(det["classes"][t][i]),
                         "score": float(det["scores"][t][i])}
                        for i in valid])
            sequences.append({"name": seq, "images": imgs,
                              "gt": gt, "pred": pred})
        build_bscan_inspector(sequences, args.out)
    else:
        from pautdx.eval.report import prediction_map
        from pautdx.viz.inspect import build_signal_inspector

        predict = meta = None
        if args.checkpoint:
            predict, meta = _load_signal_model(args.checkpoint)
        sequences = []
        for seq, vol in _iter_volumes(args.data):
            heat = None
            if predict is not None:
                heat = np.nan_to_num(
                    prediction_map(predict, vol, meta.get("seq_len", 50)))
            for bi, bk in enumerate(vol.beam_keys):
                infos = vol.scan_infos[bk]
                sequences.append({
                    "name": f"{seq}/{bk}",
                    "signals": vol.signals[bk],
                    "labels": [i.binary_label for i in infos],
                    "positions": [list(i.position) for i in infos],
                    "label_names": [i.label for i in infos],
                    "probs": heat[bi][:len(infos)] if heat is not None
                    else None,
                })
        build_signal_inspector(sequences, args.out)
    print(f"inspector page: {args.out}")


def _cmd_export(args) -> None:
    """Export a trained signal model to a portable StableHLO artifact —
    the ONNX-export replacement (~ `resaveModelOnnx.py`)."""
    import jax.numpy as jnp

    from pautdx.serve.export import export_signal_model

    predict, meta = _load_signal_model(args.checkpoint)
    # rebuild model+variables (predict closes over them; re-derive for export)
    from pautdx.models.signal.detection_zoo import MODEL_ZOO
    from pautdx.train import CheckpointManager

    ckpt = CheckpointManager(args.checkpoint)
    state, _ = ckpt.restore("best" if "best" in ckpt._markers() else "latest")
    model = MODEL_ZOO[meta["model"]]()
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    export_signal_model(
        model, variables,
        (args.batch, args.num_signals, args.signal_length), args.out,
        polymorphic_batch=args.polymorphic)
    print(f"StableHLO artifact: {args.out}")


def _cmd_train_temporal(args) -> None:
    """Train a temporal D-FINE over B-scan sequences
    (~ `temporal_dfine.py:249-314`: frozen trunk, per-frame Hungarian loss,
    anomaly consistency for v3)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from pautdx.data.vision import detection_frames_from_volume, sequence_chunks
    from pautdx.data.volume import parse_json_volume, parse_txt_tree
    from pautdx.losses.detr import dfine_criterion
    from pautdx.models.vision.dfine import DFineConfig, dfine_nano
    from pautdx.models.vision.hgnet import HGNetConfig
    from pautdx.models.vision.temporal_dfine import (
        TemporalDFine, init_heads_from_trunk, temporal_consistency_loss,
        trainable_mask,
    )
    from pautdx.train import CheckpointManager

    trunk_state = None
    if args.trunk:
        # restore the trained single-frame D-FINE FIRST: its persisted
        # config (not the preset defaults) must define the trunk
        trunk_state, trunk_meta = CheckpointManager(args.trunk).restore(
            "latest")
    if args.trunk and trunk_meta.get("dfine_config"):
        from pautdx.models.vision.dfine import config_from_dict
        cfg = config_from_dict(trunk_meta["dfine_config"])
    elif args.tiny:
        cfg = DFineConfig(
            num_labels=args.num_classes, d_model=64, encoder_hidden_dim=64,
            decoder_layers=2, decoder_attention_heads=4,
            encoder_attention_heads=4, decoder_ffn_dim=128,
            encoder_ffn_dim=128, num_queries=20, max_num_bins=16,
            hidden_expansion=0.5,
            backbone=HGNetConfig(
                stem_channels=(3, 8, 8), stage_in_channels=(8, 16, 32, 64),
                stage_mid_channels=(8, 8, 16, 32),
                stage_out_channels=(16, 32, 64, 128),
                stage_num_blocks=(1, 1, 1, 1), stage_num_layers=(1, 1, 2, 2)))
    else:
        cfg = dfine_nano(num_labels=args.num_classes)
    # v2/v3 re-classify into defect classes + 1 no-object (the reference's
    # ignore_mismatched_sizes fresh-head semantics); v1 keeps trunk labels
    num_temporal_labels = (None if args.variant == "v1"
                           else args.defect_classes + 1)
    model = TemporalDFine(cfg, variant=args.variant,
                          num_temporal_labels=num_temporal_labels,
                          num_temporal_layers=args.temporal_layers,
                          temporal_heads=4 if args.tiny else 8)

    chunks = []
    for entry in sorted(os.listdir(args.data)):
        path = os.path.join(args.data, entry)
        if entry.endswith(".json"):
            vol = parse_json_volume(path)
        elif os.path.isdir(path):
            vol = parse_txt_tree(args.data, entry)
        else:
            continue
        frames = detection_frames_from_volume(vol, out_size=args.size,
                                              max_boxes=args.max_boxes)
        chunks.extend(sequence_chunks(frames, seq_len=args.seq_len))
    print(f"{len(chunks)} sequences of {args.seq_len} frames")

    c0 = chunks[0]
    x0 = jnp.asarray(c0.images)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    if trunk_state is not None:
        # load the trained single-frame D-FINE (train-bscan --detector
        # dfine checkpoint) into the trunk — the reference builds every
        # temporal variant ON TOP of a trained base model
        # (`temporal_dfine.py:125-131` loads the finetuned checkpoint)
        params = dict(variables["params"])
        bstats = dict(variables["batch_stats"])
        params["trunk"] = trunk_state["params"]
        bstats["trunk"] = trunk_state.get("batch_stats", {})
        variables = {"params": params, "batch_stats": bstats}
    else:
        print("warning: no --trunk checkpoint given — the frozen trunk "
              "stays randomly initialized; the temporal encoder would "
              "train on noise features (smoke runs only)")
    # reference head reuse: trunk final heads seed the temporal heads
    # (class head stays fresh on a label-count mismatch — v2/v3)
    variables = init_heads_from_trunk(variables, args.variant)
    params, bstats = variables["params"], variables["batch_stats"]

    # per-variant trainability + the reference v3's 3-group AdamW
    # (`temp_dfine_over_improved.py:389-410`): trunk 1e-5, temporal 5e-4,
    # classifier 1e-4. v1/v2 train a single group at --lr.
    mask = trainable_mask(args.variant, params)

    def group(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        trainable = mask
        for k in keys:
            trainable = trainable[k] if not isinstance(trainable, bool) \
                else trainable
        if not trainable:
            return "frozen"
        top = keys[0]
        if top in ("temporal_encoder", "temporal_attention.0",
                   "temporal_attention.2", "anomaly_detector.0",
                   "anomaly_detector.2", "anomaly_detector.4",
                   "context_aggregator", "context_projector"):
            return "temporal"
        if top == "class_head":
            return "classifier"
        return "trunk"

    labels = jax.tree_util.tree_map_with_path(group, params)
    if args.variant == "v3":
        tx = {"frozen": optax.set_to_zero(),
              "trunk": optax.adamw(1e-5, weight_decay=0.01),
              "temporal": optax.adamw(5e-4, weight_decay=0.01),
              "classifier": optax.adamw(1e-4, weight_decay=0.01)}
    else:
        tx = {"frozen": optax.set_to_zero(),
              "trunk": optax.adam(args.lr),
              "temporal": optax.adam(args.lr),
              "classifier": optax.adam(args.lr)}
    from pautdx.train.optim import zero_frozen_grads

    # frozen grads zero BEFORE the clip (they would inflate the global
    # norm and over-shrink the trainable updates)
    opt = optax.chain(zero_frozen_grads(labels),
                      optax.clip_by_global_norm(1.0),
                      optax.multi_transform(tx, labels))
    opt_state = opt.init(params)

    def loss_fn(p, images, gt_boxes, gt_classes, gt_mask):
        out = model.apply({"params": p, "batch_stats": bstats}, images,
                          train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        head_out = {
            "intermediate_logits": [out["logits"]],
            "intermediate_boxes": [out["pred_boxes"]],
            "intermediate_corners": [],
            "initial_references": [],
        }
        loss, _ = dfine_criterion(head_out, gt_boxes, gt_classes, gt_mask,
                                  model.head_labels, cfg.max_num_bins)
        if args.variant == "v3":
            loss = loss + 0.1 * temporal_consistency_loss(out["anomaly"])
        return loss

    @jax.jit
    def step(p, opt_state, images, gt_boxes, gt_classes, gt_mask):
        loss, grads = jax.value_and_grad(loss_fn)(p, images, gt_boxes,
                                                  gt_classes, gt_mask)
        updates, opt_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    ckpt = CheckpointManager(args.out)
    for epoch in range(args.epochs):
        losses = []
        for chunk in chunks:
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(chunk.images),
                jnp.asarray(chunk.normalized_cxcywh()),
                jnp.asarray(chunk.classes), jnp.asarray(chunk.mask))
            losses.append(float(loss))
        mean_loss = float(np.mean(losses))
        print(f"[epoch {epoch}] loss={mean_loss:.4f}")
        ckpt.save(epoch, jax.device_get({"params": params,
                                         "batch_stats": bstats}),
                  metadata={"variant": args.variant, "seq_len": args.seq_len,
                            "num_classes": args.num_classes,
                            "defect_classes": args.defect_classes,
                            "num_temporal_labels": num_temporal_labels,
                            "size": args.size},
                  history={"loss": losses}, is_best=True)
    print(f"checkpoints in {args.out}")


def _cmd_bridge(args) -> None:
    from pautdx.serve import serve_signals

    class _Endpoint:
        def predict(self, signals):
            predict, _ = _load_signal_model(args.checkpoint)
            import numpy as np
            out = predict(signals)
            prob = np.asarray(out["prob"] if isinstance(out, dict) else out)
            res = {"prob": prob,
                   "pred": (prob >= args.threshold).astype(float)}
            if isinstance(out, dict) and "positions" in out:
                res["positions"] = np.asarray(out["positions"])
            return res

    serve_signals(_Endpoint())


def main(argv=None) -> None:
    p = argparse.ArgumentParser("pautdx")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-dataset")
    b.add_argument("--data", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--size", type=int, default=320)
    b.add_argument("--yolo", action="store_true")
    b.add_argument("--keep-empty", type=float, default=0.1)
    b.set_defaults(fn=_cmd_build_dataset)

    t = sub.add_parser("train-signal")
    t.add_argument("--data", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--model", default="HybridBinary")
    t.add_argument("--recipe", default="detection")
    t.add_argument("--epochs", type=int)
    t.add_argument("--batch-size", type=int)
    t.add_argument("--seq-len", type=int)
    t.add_argument("--defect-focused", action="store_true")
    t.add_argument("--dp", action="store_true",
                   help="data-parallel over all local devices")
    t.set_defaults(fn=_cmd_train_signal)

    e = sub.add_parser("eval-signal")
    e.add_argument("--data", required=True)
    e.add_argument("--checkpoint", required=True)
    e.add_argument("--out", default="eval_out")
    e.add_argument("--threshold", type=float, default=0.5)
    e.set_defaults(fn=_cmd_eval_signal)

    pr = sub.add_parser("predict-signal")
    pr.add_argument("--data", required=True)
    pr.add_argument("--checkpoint", required=True)
    pr.add_argument("--out", default="predictions")
    pr.add_argument("--heatmaps", action="store_true")
    pr.set_defaults(fn=_cmd_predict_signal)

    tb = sub.add_parser("train-bscan")
    tb.add_argument("--data", required=True)
    tb.add_argument("--out", required=True)
    tb.add_argument("--detector", choices=("yolo", "dfine"), default="yolo")
    tb.add_argument("--size", type=int, default=320)
    tb.add_argument("--num-classes", type=int, default=1)
    tb.add_argument("--scale", default="n")
    tb.add_argument("--flavour", default="v8",
        choices=("v8", "v5", "v9c", "v11"))
    tb.add_argument("--max-boxes", type=int, default=8)
    tb.add_argument("--batch-size", type=int, default=8)
    tb.add_argument("--epochs", type=int, default=10)
    tb.add_argument("--lr", type=float, default=1e-3)
    tb.add_argument("--augment", action="store_true")
    tb.set_defaults(fn=_cmd_train_bscan)

    pb = sub.add_parser("predict-bscan")
    pb.add_argument("--data", required=True)
    pb.add_argument("--out", default="bscan_predictions")
    pb.add_argument("--detector", choices=("yolo", "dfine"), default="dfine")
    pb.add_argument("--checkpoint")
    pb.add_argument("--size", type=int, default=320)
    pb.add_argument("--num-classes", type=int, default=2)
    pb.add_argument("--scale", default="n")
    pb.add_argument("--flavour", default="v8",
        choices=("v8", "v5", "v9c", "v11"))
    pb.add_argument("--threshold", type=float, default=0.3)
    pb.add_argument("--quant", choices=("none", "int8"), default="none",
                    help="int8: activation-int8 serving (s8xs8->s32 convs, "
                         "scales self-calibrated on the first request)")
    pb.add_argument("--fused-attn", action="store_true",
                    help="D-FINE: Pallas fused AIFI attention (+11% fps "
                         "on TPU; param-free, any checkpoint loads)")
    pb.add_argument("--prepatch", action="store_true",
                    help="D-FINE: host-side space-to-depth wire format "
                         "(+12.7% fps on TPU; bit-identical detections)")
    pb.add_argument("--overlays", action="store_true")
    pb.set_defaults(fn=_cmd_predict_bscan)

    ins = sub.add_parser("inspect")
    ins.add_argument("--data", required=True)
    ins.add_argument("--mode", choices=("bscan", "signal"), default="bscan")
    ins.add_argument("--out", default="inspector.html")
    ins.add_argument("--checkpoint")
    ins.add_argument("--detector", choices=("yolo", "dfine"),
                     default="dfine")
    ins.add_argument("--size", type=int, default=320)
    ins.add_argument("--num-classes", type=int, default=2)
    ins.add_argument("--scale", default="n")
    ins.add_argument("--flavour", default="v8",
        choices=("v8", "v5", "v9c", "v11"))
    ins.add_argument("--threshold", type=float, default=0.3)
    ins.set_defaults(fn=_cmd_inspect)

    xp = sub.add_parser("explain")
    xp.add_argument("--out", default="explainers",
                    help="output directory for the animated HTML scenes")
    xp.set_defaults(fn=_cmd_explain)

    ex = sub.add_parser("export")
    ex.add_argument("--checkpoint", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--batch", type=int, default=1)
    ex.add_argument("--num-signals", type=int, default=50)
    ex.add_argument("--signal-length", type=int, default=320)
    ex.add_argument("--polymorphic", action="store_true",
                    help="symbolic batch dimension")
    ex.set_defaults(fn=_cmd_export)

    tt = sub.add_parser("train-temporal")
    tt.add_argument("--data", required=True)
    tt.add_argument("--out", required=True)
    tt.add_argument("--variant", choices=("v1", "v2", "v3"), default="v3")
    tt.add_argument("--size", type=int, default=320)
    tt.add_argument("--seq-len", type=int, default=50)
    tt.add_argument("--num-classes", type=int, default=2)
    tt.add_argument("--defect-classes", type=int, default=2,
                    help="v2/v3: defect classes (temporal head gets +1 "
                         "no-object column)")
    tt.add_argument("--max-boxes", type=int, default=8)
    tt.add_argument("--temporal-layers", type=int, default=4)
    tt.add_argument("--epochs", type=int, default=3)
    tt.add_argument("--lr", type=float, default=1e-5)
    tt.add_argument("--tiny", action="store_true",
                    help="tiny trunk (tests / smoke runs)")
    tt.add_argument("--trunk", default=None,
                    help="trained single-frame D-FINE checkpoint dir "
                         "(train-bscan --detector dfine output) to load "
                         "into the trunk; without it the frozen trunk is "
                         "random init (smoke runs only)")
    tt.set_defaults(fn=_cmd_train_temporal)

    br = sub.add_parser("bridge")
    br.add_argument("--checkpoint", required=True)
    br.add_argument("--threshold", type=float, default=0.5)
    br.set_defaults(fn=_cmd_bridge)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
