"""Evaluation harness: run a model over a dataset, produce report artifacts.

Formalizes the reference's evaluator scripts
(`acc_metrics_hybrid_binary_dynamic_.py:73-251`, `evaluate_model.py:207-470`)
as one class: per-signal detection metrics (confusion, accuracy, P/R/F1,
specificity, balanced accuracy, MCC, AUC), 1D position IoU statistics +
accuracy@IoU{0.1,0.2,0.3,0.5}, CSV + text artifacts, and the beam x scan
prediction heatmap data (`GNN_testing_multi_v2_MAP.py`).
"""

from __future__ import annotations

import csv
import json
import os
from typing import Callable, Dict, Optional

import numpy as np

from pautdx.data.datasets import BatchIterator, SignalSequences
from pautdx.eval.iou import iou_statistics
from pautdx.eval.metrics import auc_roc, classification_report, format_report


class SignalEvaluator:
    """Evaluate a per-signal detector (probabilities + optional positions)."""

    def __init__(self, predict_fn: Callable[[np.ndarray], Dict],
                 threshold: float = 0.5, batch_size: int = 8):
        self.predict_fn = predict_fn
        self.threshold = threshold
        self.batch_size = batch_size

    def run(self, ds: SignalSequences,
            out_dir: Optional[str] = None) -> Dict[str, float]:
        probs, labels, masks = [], [], []
        pred_pos, true_pos = [], []
        it = BatchIterator(ds, self.batch_size, shuffle=False,
                           drop_remainder=False)
        for batch in it:
            out = self.predict_fn(batch["signals"])
            p = np.asarray(out["prob"] if isinstance(out, dict) else out)
            probs.append(p)
            labels.append(batch["labels"])
            masks.append(np.broadcast_to(batch["sample_mask"][:, None],
                                         p.shape))
            if isinstance(out, dict) and "positions" in out:
                pred_pos.append(np.asarray(out["positions"]))
                true_pos.append(batch["positions"])
        probs = np.concatenate(probs)
        labels = np.concatenate(labels)
        masks = np.concatenate(masks)

        report = classification_report(probs, labels, self.threshold, masks)
        report["auc"] = auc_roc(probs, labels, masks)
        if pred_pos:
            pp = np.concatenate(pred_pos)
            tp = np.concatenate(true_pos)
            defect_mask = (labels > 0.5) & (masks > 0)
            report.update(iou_statistics(pp.reshape(-1, 2),
                                         tp.reshape(-1, 2),
                                         defect_mask.reshape(-1)))
        if out_dir is not None:
            self.save_artifacts(report, out_dir)
        return report

    @staticmethod
    def save_artifacts(report: Dict[str, float], out_dir: str) -> None:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "metrics.txt"), "w") as f:
            f.write(format_report(report, "evaluation metrics") + "\n")
        with open(os.path.join(out_dir, "metrics.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["metric", "value"])
            for k, v in report.items():
                w.writerow([k, v])
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            # NaN metrics (e.g. AUC on single-class data) would emit bare
            # NaN tokens that strict JSON parsers reject — null them
            clean = {k: (None if isinstance(v, float) and v != v else v)
                     for k, v in report.items()}
            json.dump(clean, f, indent=1)


def prediction_map(predict_fn: Callable[[np.ndarray], Dict],
                   vol, seq_len: int = 50) -> np.ndarray:
    """Beam x scan probability heatmap for a parsed volume
    (`GNN_testing_multi_v2_MAP.py` generate_prediction_map).

    Runs the per-signal detector over every beam with chunked windows and
    stitches per-scan probabilities into an (n_beams, n_scans) map.
    """
    from pautdx.data.windowing import chunked_windows, padded_window

    n_beams = vol.n_beams
    n_scans = max(v.shape[0] for v in vol.signals.values())
    heat = np.full((n_beams, n_scans), np.nan, np.float32)
    for bi, bk in enumerate(vol.beam_keys):
        sig = vol.signals[bk]
        n = sig.shape[0]
        windows = chunked_windows(n, seq_len)
        if not windows:
            a, b, pad = padded_window(n, seq_len)
            padded = np.concatenate(
                [sig, np.zeros((pad, sig.shape[1]), sig.dtype)])
            out = predict_fn(padded[None])
            p = np.asarray(out["prob"] if isinstance(out, dict) else out)[0]
            heat[bi, :n] = p[:n]
            continue
        for (a, b) in windows:
            out = predict_fn(sig[None, a:b])
            p = np.asarray(out["prob"] if isinstance(out, dict) else out)[0]
            for j in range(a, b):
                if np.isnan(heat[bi, j]):
                    heat[bi, j] = p[j - a]
    return heat
