"""B-scan rendering as XLA-compiled image kernels.

The reference renders B-scan PNGs on host with OpenCV
(`BscanBased/DS_preprocessing.py:44-51`: bilinear resize to (W, H) then
rotate 90° clockwise) and adjusts annotations with an x-axis inversion
(`DS_preprocessing.py:143-157`). Here the render is a batched, jit-compiled
JAX function so volumes stream through the TPU: (scans, beams, samples)
-> (scans, H, W) in one fused program — no per-image host loop.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_resize_2d(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of (H, W) -> (out_h, out_w), half-pixel centers
    (cv2.INTER_LINEAR semantics)."""
    h, w = img.shape
    ys = (jnp.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (jnp.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, :]
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    return top * (1 - wy[:, 0:1]) + bot * wy[:, 0:1]


def rotate90_cw(img: jnp.ndarray) -> jnp.ndarray:
    """Rotate (H, W) 90° clockwise: out[i, j] = in[H-1-j, i]."""
    return jnp.flip(jnp.swapaxes(img, -1, -2), axis=-1)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "normalize"))
def render_bscans(scan_images: jnp.ndarray, out_h: int = 320, out_w: int = 320,
                  normalize: bool = True) -> jnp.ndarray:
    """Batched B-scan render: (T, beams, samples) -> (T, out_h, out_w).

    Per frame: |signal| amplitude image -> bilinear resize (out_w, out_h)
    -> rotate 90° CW — matching `resize_image` in `DS_preprocessing.py:44-51`
    (cv2.resize takes (width, height); the rotate swaps them back).
    """
    x = jnp.abs(scan_images.astype(jnp.float32))
    if normalize:
        mx = jnp.max(x, axis=(-1, -2), keepdims=True)
        x = x / jnp.maximum(mx, 1e-8)
    # resize to (out_w rows, out_h cols) pre-rotation so the rotated image
    # is (out_h, out_w), mirroring cv2.resize(img, (W, H)) + ROTATE_90_CW
    resize = jax.vmap(lambda im: _bilinear_resize_2d(im, out_w, out_h))
    x = resize(x)
    return rotate90_cw(x)


def adjust_annotations(ann: Dict[str, list], n_beams: int,
                       size: Tuple[int, int] = (320, 320)) -> Dict[str, list]:
    """Beam/depth bboxes -> pixel bboxes on the rendered image.

    Matches `DS_preprocessing.py:143-157` including the **x-axis inversion**
    (the rotate-90-CW render flips the beam axis): beam index i maps to
    pixel ``W - W*i/(n_beams-1)``; depth d (normalized) maps to ``d * H``.
    bbox stays [x1, x2, y1, y2] like the reference schema.
    """
    W, H = size
    span = max(n_beams - 1, 1)
    out: Dict[str, list] = {}
    for key, defects in ann.items():
        adj = []
        for d in defects:
            b0, b1, d0, d1 = d["bbox"]
            x1 = int(round(W - W * (b0 / span)))
            x2 = int(round(W - W * (b1 / span)))
            y1 = int(round(d0 * H))
            y2 = int(round(d1 * H))
            adj.append({"bbox": [x1, x2, y1, y2], "label": d["label"]})
        out[key] = adj
    return out


def render_volume_dataset(vol, out_h: int = 320, out_w: int = 320
                          ) -> Tuple[np.ndarray, Dict[str, list]]:
    """ParsedVolume -> (T, H, W) rendered frames + pixel annotations."""
    from pautdx.data.volume import volume_defect_boxes

    arr = vol.beam_array()                       # (beams, scans, samples)
    frames = jnp.swapaxes(arr, 0, 1)             # (scans, beams, samples)
    imgs = np.asarray(render_bscans(frames, out_h, out_w))
    ann = adjust_annotations(volume_defect_boxes(vol), vol.n_beams,
                             (out_w, out_h))
    return imgs, ann


def bbox_xyxy_from_schema(bbox: List[float]) -> Tuple[float, float, float, float]:
    """Schema [x1, x2, y1, y2] (x may be inverted) -> canonical (x1, y1, x2, y2)."""
    x1, x2, y1, y2 = bbox
    return (min(x1, x2), min(y1, y2), max(x1, x2), max(y1, y2))
