"""Vision models: YOLO detect/seg, D-FINE, temporal D-FINE."""

from pautdx.models.vision.yolo import (  # noqa: F401
    YOLO, YoloConfig, anchor_points, assemble_masks, decode_boxes,
    dfl_expectation,
)
