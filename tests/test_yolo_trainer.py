"""Trainer-level YOLO integration: synthetic B-scan dataset -> generic
Trainer -> loss decreases -> NMS predictions + mAP evaluator runs."""

import numpy as np
import pytest

import jax

from pautdx.data import synthetic
from pautdx.data.vision import detection_frames_from_volume
from pautdx.data.volume import parse_json_volume
from pautdx.eval import evaluate_map
from pautdx.losses.yolo import yolo_loss
from pautdx.models.vision import YOLO, YoloConfig, decode_boxes
from pautdx.ops import dense_to_detections
from pautdx.train import Trainer, make_optimizer

IMG = 64


@pytest.fixture(scope="module")
def frames():
    spec = synthetic.VolumeSpec(n_beams=6, n_scans=24, n_samples=128, seed=31)
    defects = [synthetic.SyntheticDefect(1, 4, 4, 20, 0.3, 0.5)]
    vol_arr, _ = synthetic.generate_volume(spec, defects)
    vol = parse_json_volume(synthetic.volume_to_json_dict(vol_arr, defects))
    return detection_frames_from_volume(vol, out_size=IMG, max_boxes=4)


def test_yolo_trainer_integration(frames):
    cfg = YoloConfig(num_classes=1, scale="n")
    model = YOLO(cfg)

    def objective(out, batch):
        loss, aux = yolo_loss(out, batch["boxes"], batch["classes"],
                              batch["mask"], cfg, (IMG, IMG))
        return loss, aux

    def batches():
        for start in (0, 8):
            idx = np.arange(start, start + 8)
            yield {
                "images": frames.images[idx],
                "boxes": frames.boxes[idx],
                "classes": frames.classes[idx],
                "mask": frames.mask[idx],
            }

    opt = make_optimizer(2e-3, weight_decay=0.0)
    trainer = Trainer(model, objective, opt, input_key="images")
    state = trainer.init(next(iter(batches())))
    losses = []
    for _ in range(4):
        state, m = trainer.train_epoch(state, batches())
        losses.append(m["box"] + m["cls"] + m["dfl"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # inference path: decode + NMS + mAP evaluator glue
    variables = {"params": state.params}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats
    out = model.apply(variables, frames.images[:4], train=False)
    d = decode_boxes(out, (IMG, IMG), cfg)
    det = dense_to_detections(d, score_threshold=0.0, top_k=32, max_det=8)
    preds, gts = [], []
    for i in range(4):
        valid = np.asarray(det["valid"][i])
        preds.append({
            "boxes": np.asarray(det["boxes"][i])[valid],
            "scores": np.asarray(det["scores"][i])[valid],
            "classes": np.asarray(det["classes"][i])[valid],
        })
        gmask = frames.mask[i] > 0
        gts.append({"boxes": frames.boxes[i][gmask],
                    "classes": frames.classes[i][gmask]})
    m = evaluate_map(preds, gts, num_classes=1)
    assert np.isfinite(m["mAP@0.5"]) or np.isnan(m["mAP@0.5"])
