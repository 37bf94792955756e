"""pautdx — TPU-native (JAX/XLA/Pallas/pjit) PAUT defect-detection framework.

A ground-up rebuild of the capabilities of
CSMaus/DefectDetection_viaObjectDetection (see SURVEY.md) designed TPU-first:

- ``pautdx.data``    — PAUT volume grammar, B-scan rendering, windowing,
  augmentation, and double-buffered host->device prefetch.
- ``pautdx.nn``      — reusable flax building blocks (conv stacks, local
  attention, relative/sinusoidal position encodings, transformer encoders,
  1D FPN + FiLM).
- ``pautdx.models``  — the signal-domain model zoo and the vision detectors
  (YOLO, D-FINE, temporal D-FINE).
- ``pautdx.losses``  — focal/BCE, masked regression, 1D IoU, CenterNet-1D
  heatmaps, Hungarian matching + DETR criterion, YOLO TAL/CIoU/DFL.
- ``pautdx.ops``     — Pallas TPU kernels (NMS, image ops, deformable
  attention sampling).
- ``pautdx.train``   — generic pjit Trainer (AdamW param groups, schedules,
  EMA, grad clip, orbax checkpoints with self-describing metadata).
- ``pautdx.eval``    — detection metrics (P/R/F1/MCC/AUC), 1D IoU@t, mAP.
- ``pautdx.serve``   — jit-compiled inference endpoints + stdin/stdout JSON
  bridge (process-boundary parity with the reference C#-host protocol).
- ``pautdx.compat``  — torch ``.pth`` / HF safetensors checkpoint importers.
- ``pautdx.mesh``    — device mesh + sharding rules (dp default).
"""

from pautdx.version import __version__  # noqa: F401
