"""Vision-stack quality gates: the YOLO and D-FINE trainers must reach
nontrivial mAP@0.5 on easy synthetic B-scan defects (not merely decrease
loss). Counterpart of the reference's saved eval artifact for the signal
stack (`signals/improved_multisignal/test_results_Complex_20250717_1733/
Complex_metrics.txt` — BASELINE.md); the reference has no formal test
suite at all (SURVEY.md §4), so these gates are new capability.

Thresholds are set at 0.6 with wide margin: on these fixtures the tiny
D-FINE reaches ~0.98 and the tiny YOLO 1.0 (measured on the forced-CPU
8-device test mesh).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pautdx.data import synthetic
from pautdx.data.vision import detection_frames_from_volume
from pautdx.data.volume import parse_json_volume
from pautdx.eval import evaluate_map
from pautdx.losses.detr import dfine_criterion
from pautdx.losses.yolo import yolo_loss
from pautdx.models.vision import YOLO, YoloConfig, decode_boxes
from pautdx.models.vision.dfine import DFine, DFineConfig, post_process
from pautdx.models.vision.hgnet import HGNetConfig
from pautdx.ops import dense_to_detections

IMG = 64

TINY_DFINE = DFineConfig(
    num_labels=1, d_model=64, encoder_hidden_dim=64, decoder_layers=2,
    decoder_attention_heads=4, encoder_attention_heads=4,
    decoder_ffn_dim=128, encoder_ffn_dim=128, num_queries=20,
    max_num_bins=16, hidden_expansion=0.5,
    backbone=HGNetConfig(
        stem_channels=(3, 8, 8), stage_in_channels=(8, 16, 32, 64),
        stage_mid_channels=(8, 8, 16, 32), stage_out_channels=(16, 32, 64, 128),
        stage_num_blocks=(1, 1, 1, 1), stage_num_layers=(1, 1, 2, 2),
    ),
)


@pytest.fixture(scope="module")
def easy_frames():
    """Easy, high-contrast single-defect frames from 4 synthetic volumes."""
    imgs, boxes, classes, masks = [], [], [], []
    for s in range(4):
        spec = synthetic.VolumeSpec(n_beams=6, n_scans=24, n_samples=128,
                                    seed=40 + s)
        defects = [synthetic.SyntheticDefect(1 + (s % 3), 4, 3 + (s % 2),
                                             20 + 8 * (s % 3), 0.3, 0.6)]
        vol_arr, _ = synthetic.generate_volume(spec, defects)
        vol = parse_json_volume(synthetic.volume_to_json_dict(vol_arr, defects))
        fr = detection_frames_from_volume(vol, out_size=IMG, max_boxes=4)
        imgs.append(fr.images)
        boxes.append(fr.boxes)
        classes.append(fr.classes)
        masks.append(fr.mask)
    images = np.concatenate(imgs)
    boxes = np.concatenate(boxes)
    classes = np.concatenate(classes)
    mask = np.concatenate(masks)
    keep = mask.sum(-1) > 0
    images, boxes, classes, mask = (images[keep], boxes[keep], classes[keep],
                                    mask[keep])
    n = min(24, images.shape[0])
    return images[:n], boxes[:n], classes[:n], mask[:n]


def _map_at_05(preds, gts):
    return evaluate_map(preds, gts, num_classes=1)["mAP@0.5"]


def test_dfine_quality_gate(easy_frames):
    images, boxes_px, classes, mask = easy_frames
    n = images.shape[0]
    x1, y1, x2, y2 = [boxes_px[..., i] for i in range(4)]
    gt = np.stack([(x1 + x2) / 2 / IMG, (y1 + y2) / 2 / IMG,
                   (x2 - x1) / IMG, (y2 - y1) / IMG], -1).astype(np.float32)

    model = DFine(TINY_DFINE)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, IMG, IMG, 3)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.warmup_cosine_decay_schedule(0, 4e-4, 50, 400, 1e-5),
                    weight_decay=1e-4))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, im, gtb, gtc, gtm, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, im, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            loss, _ = dfine_criterion(out, gtb, gtc, gtm,
                                      TINY_DFINE.num_labels,
                                      TINY_DFINE.max_num_bins)
            return loss, mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    for i in range(400):
        idx = rng.choice(n, 8, replace=False)
        key, k = jax.random.split(key)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jnp.asarray(images[idx]),
            jnp.asarray(gt[idx]), jnp.asarray(classes[idx]),
            jnp.asarray(mask[idx]), k)
    assert np.isfinite(float(loss))

    out = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.asarray(images), train=False)
    pp = post_process(out["logits"], out["pred_boxes"], (IMG, IMG),
                      threshold=0.05, max_det=8)
    preds, gts = [], []
    for i in range(n):
        v = np.asarray(pp["valid"][i])
        preds.append({"boxes": np.asarray(pp["boxes"][i])[v],
                      "scores": np.asarray(pp["scores"][i])[v],
                      "classes": np.asarray(pp["classes"][i])[v]})
        gm = mask[i] > 0
        gts.append({"boxes": boxes_px[i][gm], "classes": classes[i][gm]})
    m = _map_at_05(preds, gts)
    assert m >= 0.6, f"D-FINE quality gate failed: mAP@0.5={m:.3f}"


@pytest.mark.parametrize("flavour,steps", [
    # all four reference-matched flavours must LEARN TO DETECT, not
    # merely decrease loss (VERDICT r3 item 4). Steps are per-flavour:
    # v9c is the unscaled 25M-param GELAN (`yolov9c.yaml` has no n-scale)
    # and converges to 1.0 on these fixtures in 150 steps (measured),
    # so it gets a shorter schedule to keep the CPU suite tractable.
    ("v8", 450), ("v5", 450), ("v9c", 150), ("v11", 450),
])
def test_yolo_quality_gate(easy_frames, flavour, steps):
    images, boxes_px, classes, mask = easy_frames
    n = images.shape[0]
    cfg = YoloConfig(num_classes=1, scale="n", flavour=flavour)
    model = YOLO(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, IMG, IMG, 3)), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    has_bs = bool(jax.tree_util.tree_leaves(batch_stats))
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.warmup_cosine_decay_schedule(0, 2e-3, 30, steps,
                                                       1e-5),
                    weight_decay=1e-4))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, im, gtb, gtc, gtm):
        def loss_fn(p):
            v = {"params": p}
            if has_bs:
                v["batch_stats"] = batch_stats
                out, mut = model.apply(v, im, train=True,
                                       mutable=["batch_stats"])
                bs = mut["batch_stats"]
            else:
                out = model.apply(v, im, train=True)
                bs = batch_stats
            loss, _ = yolo_loss(out, gtb, gtc, gtm, cfg, (IMG, IMG))
            return loss, bs

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    rng = np.random.default_rng(0)
    for i in range(steps):
        idx = rng.choice(n, 8, replace=False)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jnp.asarray(images[idx]),
            jnp.asarray(boxes_px[idx]), jnp.asarray(classes[idx]),
            jnp.asarray(mask[idx]))
    assert np.isfinite(float(loss))

    v = {"params": params}
    if has_bs:
        v["batch_stats"] = batch_stats
    out = model.apply(v, jnp.asarray(images), train=False)
    d = decode_boxes(out, (IMG, IMG), cfg)
    det = dense_to_detections(d, score_threshold=0.05, top_k=32, max_det=8)
    preds, gts = [], []
    for i in range(n):
        valid = np.asarray(det["valid"][i])
        preds.append({"boxes": np.asarray(det["boxes"][i])[valid],
                      "scores": np.asarray(det["scores"][i])[valid],
                      "classes": np.asarray(det["classes"][i])[valid]})
        gm = mask[i] > 0
        gts.append({"boxes": boxes_px[i][gm], "classes": classes[i][gm]})
    m = _map_at_05(preds, gts)
    assert m >= 0.6, f"YOLO quality gate failed: mAP@0.5={m:.3f}"


@pytest.mark.parametrize("flavour,steps", [
    # v8-seg (the default) and v9c-seg — the reference's segmentation
    # training targets yolov9c-seg (`BscanBased/yolo_seg_train.py:5-19`).
    # Per-flavour steps as in the det gate (v9c is the unscaled GELAN).
    ("v8", 450), ("v9c", 180),
])
def test_yolo_seg_quality_gate(easy_frames, flavour, steps):
    """Mask-quality gate (VERDICT r2 weak item 6): YOLO-seg must reach
    nontrivial mask mAP@0.5, not merely decrease its seg loss. GT masks
    are filled rectangles from the defect boxes — exactly what the
    reference's converter feeds Ultralytics
    (`BscanBased/yolo_ds_segmentation.py:9-109`)."""
    from pautdx.data.annotations import rasterize_boxes
    from pautdx.eval.seg import evaluate_mask_map
    from pautdx.models.vision import assemble_masks

    images, boxes_px, classes, mask = easy_frames
    n = images.shape[0]
    Hp = IMG // 4
    # GT masks at proto resolution: filled boxes scaled by /4
    gt_masks = np.zeros((n, mask.shape[1], Hp, Hp), np.float32)
    for i in range(n):
        for j in range(mask.shape[1]):
            if mask[i, j] > 0:
                gt_masks[i, j] = rasterize_boxes(
                    boxes_px[i, j:j + 1] / 4.0, (Hp, Hp), value=1.0)

    cfg = YoloConfig(num_classes=1, scale="n", flavour=flavour, seg=True)
    model = YOLO(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, IMG, IMG, 3)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.warmup_cosine_decay_schedule(0, 2e-3, 30, steps, 1e-5),
                    weight_decay=1e-4))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, im, gtb, gtc, gtm, gtmk, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, im, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            loss, _ = yolo_loss(out, gtb, gtc, gtm, cfg, (IMG, IMG),
                                gt_masks=gtmk)
            return loss, mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    for i in range(steps):
        idx = rng.choice(n, 8, replace=False)
        key, k = jax.random.split(key)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jnp.asarray(images[idx]),
            jnp.asarray(boxes_px[idx]), jnp.asarray(classes[idx]),
            jnp.asarray(mask[idx]), jnp.asarray(gt_masks[idx]), k)
    assert np.isfinite(float(loss))

    out = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.asarray(images), train=False)
    d = decode_boxes(out, (IMG, IMG), cfg)
    det = dense_to_detections(d, score_threshold=0.05, top_k=32, max_det=8)
    coeffs = jnp.take_along_axis(d["coeffs"], det["indices"][..., None],
                                 axis=1)
    masks_pred = np.asarray(assemble_masks(out["protos"], coeffs,
                                           det["boxes"], (IMG, IMG)))
    preds, gts = [], []
    for i in range(n):
        v = np.asarray(det["valid"][i])
        preds.append({"masks": masks_pred[i][v],
                      "scores": np.asarray(det["scores"][i])[v],
                      "classes": np.asarray(det["classes"][i])[v]})
        gm = mask[i] > 0
        gts.append({"masks": gt_masks[i][gm], "classes": classes[i][gm]})
    m = evaluate_mask_map(preds, gts, num_classes=1)["mask_mAP@0.5"]
    assert m >= 0.6, f"YOLO-seg mask quality gate failed: mask mAP@0.5={m:.3f}"


def test_map_empty_predictions_returns_zero_not_nan():
    """eval/map.py regression: empty prediction/GT sets must yield 0.0."""
    import warnings

    empty = {"boxes": np.zeros((0, 4)), "scores": np.zeros((0,)),
             "classes": np.zeros((0,))}
    no_gt = {"boxes": np.zeros((0, 4)), "classes": np.zeros((0,))}
    with warnings.catch_warnings():
        warnings.simplefilter("error")   # any RuntimeWarning -> failure
        m = evaluate_map([empty], [no_gt], num_classes=1)
    assert m["mAP@0.5"] == 0.0 and m["mAP"] == 0.0
    # empty predictions but GT present -> 0.0, finite
    gt = {"boxes": np.asarray([[0, 0, 10, 10]], np.float32),
          "classes": np.zeros((1,))}
    m = evaluate_map([empty], [gt], num_classes=1)
    assert m["mAP@0.5"] == 0.0 and np.isfinite(m["mAP"])
