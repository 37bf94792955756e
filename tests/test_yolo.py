"""YOLO family: forward shapes, decode, NMS, TAL loss sanity, tiny overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pautdx.losses.yolo import ciou_xyxy, task_aligned_assign, yolo_loss
from pautdx.models.vision import (
    YOLO, YoloConfig, anchor_points, assemble_masks, decode_boxes,
)
from pautdx.ops import dense_to_detections, nms

IMG = 64  # tiny for CPU tests; strides 8/16/32 -> 64+16+4 = 84 anchors


def _init(model, shape):
    x = jnp.zeros(shape, jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return v, x


@pytest.mark.parametrize("flavour", ["v8", "v5", "v9c", "v11"])
def test_yolo_forward_and_decode(flavour):
    cfg = YoloConfig(num_classes=2, scale="n", flavour=flavour)
    model = YOLO(cfg)
    v, x = _init(model, (1, IMG, IMG, 3))
    out = model.apply(v, x, train=False)
    assert len(out["levels"]) == 3
    assert out["levels"][0]["box"].shape == (1, 8, 8, 64)
    assert out["levels"][0]["cls"].shape == (1, 8, 8, 2)
    d = decode_boxes(out, (IMG, IMG), cfg)
    A = 8 * 8 + 4 * 4 + 2 * 2
    assert d["boxes"].shape == (1, A, 4)
    assert d["scores"].shape == (1, A, 2)
    assert np.isfinite(np.asarray(d["boxes"])).all()


@pytest.mark.parametrize("flavour,seg", [("v9c", True), ("v11", False)])
def test_new_flavours_train_steps(flavour, seg):
    """v9c-seg (`yolo_seg_train.py:5-19`) and yolo11n
    (`yolo/yolo_bbox_retrain.py:6-18`) train: loss finite and decreasing
    over a few steps (full-size blocks; kept short for CPU CI)."""
    import optax
    from pautdx.losses.yolo import yolo_loss

    cfg = YoloConfig(num_classes=1, scale="n", flavour=flavour, seg=seg)
    model = YOLO(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, IMG, IMG, 3)).astype(np.float32))
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]], jnp.float32)
    gt_classes = jnp.zeros((1, 1), jnp.int32)
    gt_mask = jnp.ones((1, 1))
    gt_masks = None
    if seg:
        gm = np.zeros((1, 1, IMG // 4, IMG // 4), np.float32)
        gm[:, :, 2:10, 2:10] = 1.0
        gt_masks = jnp.asarray(gm)

    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params, bs = variables["params"], variables["batch_stats"]
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, bs, opt_state):
        def lf(p):
            out, mut = model.apply({"params": p, "batch_stats": bs}, x,
                                   train=True, mutable=["batch_stats"])
            loss, _ = yolo_loss(out, gt_boxes, gt_classes, gt_mask, cfg,
                                (IMG, IMG), gt_masks=gt_masks)
            return loss, mut["batch_stats"]
        (loss, new_bs), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    losses = []
    for _ in range(5):
        params, bs, opt_state, loss = step(params, bs, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_yolo_seg_outputs():
    cfg = YoloConfig(num_classes=1, scale="n", seg=True)
    model = YOLO(cfg)
    v, x = _init(model, (1, IMG, IMG, 3))
    out = model.apply(v, x, train=False)
    assert out["protos"].shape == (1, IMG // 4, IMG // 4, 32)
    d = decode_boxes(out, (IMG, IMG), cfg)
    assert d["coeffs"].shape[-1] == 32
    masks = assemble_masks(out["protos"], d["coeffs"][:, :5],
                           d["boxes"][:, :5], (IMG, IMG))
    assert masks.shape == (1, 5, IMG // 4, IMG // 4)


def test_anchor_points_count():
    pts, strs = anchor_points((IMG, IMG))
    assert pts.shape == (84, 2)
    assert float(strs[0]) == 8.0 and float(strs[-1]) == 32.0


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [30, 30, 40, 40]],
                        jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    classes = jnp.zeros(3, jnp.int32)
    out = nms(boxes, scores, classes, iou_threshold=0.5, top_k=3, max_det=3)
    assert int(out["valid"].sum()) == 2
    kept = np.asarray(out["boxes"])[np.asarray(out["valid"])]
    assert [0, 0, 10, 10] in kept.tolist()
    assert [30, 30, 40, 40] in kept.tolist()
    # class-aware: same boxes, different classes -> both kept
    out2 = nms(boxes, scores, jnp.asarray([0, 1, 0]), iou_threshold=0.5,
               top_k=3, max_det=3)
    assert int(out2["valid"].sum()) == 3


def test_ciou_identity():
    b = jnp.asarray([[10.0, 10.0, 20.0, 30.0]])
    assert float(ciou_xyxy(b, b)[0]) > 0.999


def test_tal_assigns_inside_anchor():
    pts, _ = anchor_points((IMG, IMG))
    A = pts.shape[0]
    gt_boxes = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])
    gt_classes = jnp.asarray([0])
    gt_mask = jnp.asarray([1.0])
    # pretend predictions: boxes == gt everywhere, high score
    pred_boxes = jnp.tile(gt_boxes, (A, 1))
    cls_probs = jnp.full((A, 1), 0.9)
    assign = task_aligned_assign(cls_probs, pred_boxes, gt_boxes, gt_classes,
                                 gt_mask, pts)
    fg = np.asarray(assign["fg"])
    # only anchors whose centers are inside the gt can be fg
    inside = ((np.asarray(pts)[:, 0] >= 8) & (np.asarray(pts)[:, 0] < 24)
              & (np.asarray(pts)[:, 1] >= 8) & (np.asarray(pts)[:, 1] < 24))
    assert fg.sum() > 0
    assert np.all(fg <= inside.astype(np.float32))


def test_yolo_loss_decreases_with_training():
    cfg = YoloConfig(num_classes=1, scale="n")
    model = YOLO(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, IMG, IMG, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    gt_boxes = jnp.asarray([[[12.0, 12.0, 40.0, 40.0]]])
    gt_classes = jnp.zeros((1, 1), jnp.int32)
    gt_mask = jnp.ones((1, 1))

    import optax
    opt = optax.adam(5e-3)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    opt_state = opt.init(params)

    @jax.jit
    def step(params, bs, opt_state):
        def lf(p):
            out, mut = model.apply({"params": p, "batch_stats": bs}, x,
                                   train=True,
                                   rngs={"dropout": jax.random.PRNGKey(1)},
                                   mutable=["batch_stats"])
            loss, aux = yolo_loss(out, gt_boxes, gt_classes, gt_mask, cfg,
                                  (IMG, IMG))
            return loss, (aux, mut["batch_stats"])
        (loss, (aux, new_bs)), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    losses = []
    for _ in range(8):
        params, bs, opt_state, loss = step(params, bs, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_dense_to_detections_pipeline():
    cfg = YoloConfig(num_classes=1, scale="n")
    model = YOLO(cfg)
    v, x = _init(model, (2, IMG, IMG, 3))
    out = model.apply(v, x, train=False)
    d = decode_boxes(out, (IMG, IMG), cfg)
    det = dense_to_detections(d, score_threshold=0.0, top_k=16, max_det=8)
    assert det["boxes"].shape == (2, 8, 4)
    assert det["valid"].shape == (2, 8)


def test_width_matches_ultralytics_yaml_tables():
    """Channel widths per scale/flavour pin the Ultralytics
    ``make_divisible(min(c, max_channels) * width, 8)`` semantics —
    notably the m-scale max_channels clamp (v8m head width is 576, NOT
    1024 * 0.75 = 768; yolo11m clamps at 512). A silent formula change
    breaks restore of every checkpoint trained at that scale."""
    expected = {
        # (flavour, scale, requested) -> actual channels
        ("v8", "n", 1024): 256,
        ("v8", "s", 1024): 512,
        ("v8", "m", 1024): 576,     # min(1024, 768) * 0.75
        ("v5u", "m", 1024): 576,
        ("v11", "n", 1024): 256,
        ("v11", "s", 1024): 512,
        ("v11", "m", 1024): 512,    # min(1024, 512) * 1.0
        ("v8", "n", 256): 64,
        ("v11", "m", 256): 256,
    }
    for (flavour, scale, w), want in expected.items():
        got = YoloConfig(num_classes=1, scale=scale, flavour=flavour).width(w)
        assert got == want, (flavour, scale, w, got, want)


def test_non_divisible_size_clear_error():
    """The PAN neck needs /32 inputs (2x upsample + skip concat);
    Ultralytics rounds sizes up for the same reason. A non-/32 input must
    fail with a clear ValueError at entry, not a shape error in the neck;
    anchors also follow the ACTUAL level shapes, not img_size // stride."""
    import pytest as _pytest

    cfg = YoloConfig(num_classes=1, scale="n")
    model = YOLO(cfg)
    with _pytest.raises(ValueError, match="multiple of 32"):
        _init(model, (1, 68, 68, 3))
