"""Losses: classification, masked regression, position composites, heatmaps."""

from pautdx.losses.classification import (  # noqa: F401
    bce, bce_with_logits, cross_entropy, focal_bce_with_logits,
)
from pautdx.losses.heatmap import detloc_criterion, detloc_targets  # noqa: F401
from pautdx.losses.position import (  # noqa: F401
    detection_loss, detection_position_loss, enhanced_position_loss,
    position_accuracy_iou, seq_detector_loss, two_stage_loss,
)
from pautdx.losses.regression import (  # noqa: F401
    focal_l1, interval_iou_1d, masked_iou_loss, masked_l1, masked_smooth_l1,
    temporal_consistency, uncertainty_regularizer,
)
