"""TPU ops: fixed-shape NMS (XLA + Pallas), deformable attention sampling."""

from pautdx.ops.deformable import (  # noqa: F401
    bilinear_sample_nhwc, ms_deformable_attention, nearest_sample_nhwc,
)
from pautdx.ops.nms import batched_nms, dense_to_detections, nms  # noqa: F401
from pautdx.ops.pallas_nms import pallas_nms  # noqa: F401
from pautdx.ops.pallas_mask import pallas_assemble_masks  # noqa: F401
