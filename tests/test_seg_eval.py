import numpy as np

from pautdx.eval.seg import evaluate_mask_map, mask_iou


def _disk(h, w, cy, cx, r):
    ys, xs = np.mgrid[:h, :w]
    return ((ys - cy) ** 2 + (xs - cx) ** 2 <= r * r).astype(np.float32)


def test_mask_iou_identity_and_disjoint():
    a = _disk(32, 32, 10, 10, 5)[None]
    b = _disk(32, 32, 25, 25, 4)[None]
    assert mask_iou(a, a)[0, 0] == 1.0
    assert mask_iou(a, b)[0, 0] == 0.0


def test_mask_map_perfect_and_missed():
    gt_mask = _disk(32, 32, 12, 12, 6)
    gt = [{"masks": gt_mask[None], "classes": np.asarray([0])}]
    good = [{"masks": gt_mask[None], "scores": np.asarray([0.9]),
             "classes": np.asarray([0])}]
    bad = [{"masks": _disk(32, 32, 28, 28, 3)[None],
            "scores": np.asarray([0.9]), "classes": np.asarray([0])}]
    assert evaluate_mask_map(good, gt)["mask_mAP@0.5"] > 0.99
    assert evaluate_mask_map(bad, gt)["mask_mAP@0.5"] < 0.01


def test_mask_map_with_yolo_seg_outputs():
    """End-to-end glue: YOLO seg protos -> assembled masks -> evaluator."""
    import jax
    import jax.numpy as jnp
    from pautdx.models.vision import YOLO, YoloConfig, assemble_masks, decode_boxes
    from pautdx.ops import dense_to_detections

    IMG = 64
    cfg = YoloConfig(num_classes=1, scale="n", seg=True)
    model = YOLO(cfg)
    x = jnp.zeros((1, IMG, IMG, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    d = decode_boxes(out, (IMG, IMG), cfg)
    det = dense_to_detections(d, score_threshold=0.0, top_k=16, max_det=4)
    coeffs = jnp.take_along_axis(d["coeffs"], det["indices"][..., None], axis=1)
    masks = assemble_masks(out["protos"], coeffs, det["boxes"], (IMG, IMG))
    preds = [{"masks": np.asarray(masks[0]),
              "scores": np.asarray(det["scores"][0]),
              "classes": np.asarray(det["classes"][0])}]
    gts = [{"masks": np.zeros((1, IMG // 4, IMG // 4), np.float32),
            "classes": np.asarray([0])}]
    gts[0]["masks"][0, 4:10, 4:10] = 1.0
    m = evaluate_mask_map(preds, gts)
    assert np.isfinite(m["mask_mAP@0.5"]) or np.isnan(m["mask_mAP@0.5"])
