"""TPU ops: fixed-shape NMS (XLA + Pallas), image kernels, deformable attention."""

from pautdx.ops.nms import batched_nms, dense_to_detections, nms  # noqa: F401
