"""Evaluation: classification reports, 1D IoU metrics, 2D mAP."""

from pautdx.eval.iou import (  # noqa: F401
    detection_prf, greedy_match, interval_iou, iou_statistics,
)
from pautdx.eval.map import box_iou_xyxy, evaluate_map  # noqa: F401
from pautdx.eval.metrics import (  # noqa: F401
    auc_roc, classification_report, confusion_counts, format_report,
)
