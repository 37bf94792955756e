"""Vision models: YOLO detect/seg, D-FINE, temporal D-FINE."""

from pautdx.models.vision.dfine import (  # noqa: F401
    DFine, DFineConfig, dfine_nano, distance2bbox, integral, post_process,
    weighting_function,
)
from pautdx.models.vision.hgnet import HGNetConfig, HGNetV2  # noqa: F401
from pautdx.models.vision.yolo import (  # noqa: F401
    YOLO, YoloConfig, anchor_points, assemble_masks, decode_boxes,
    dfl_expectation,
)
