import numpy as np

from pautdx.data.augment_vision import (
    amplitude_jitter, augment_detection_batch, flip_horizontal, mosaic,
)


def test_flip_horizontal_box_mapping():
    img = np.zeros((10, 20, 1), np.float32)
    img[:, 2:5] = 1.0
    boxes = np.asarray([[2.0, 1.0, 5.0, 9.0]])
    mask = np.ones(1, np.float32)
    out, b = flip_horizontal(img, boxes, mask)
    assert np.allclose(b[0], [15, 1, 18, 9])
    assert out[:, 15:18].sum() > 0 and out[:, 2:5].sum() == 0


def test_mosaic_merges_targets():
    rng = np.random.default_rng(0)
    H = W = 32
    images = np.ones((4, H, W, 1), np.float32)
    boxes = np.zeros((4, 2, 4), np.float32)
    classes = np.zeros((4, 2), np.int32)
    masks = np.zeros((4, 2), np.float32)
    boxes[0, 0] = [4, 4, 12, 12]
    masks[0, 0] = 1.0
    boxes[3, 0] = [8, 8, 16, 16]
    classes[3, 0] = 1
    masks[3, 0] = 1.0
    m = mosaic(images, boxes, classes, masks, rng, max_boxes=4)
    assert m["image"].shape == (H, W, 1)
    assert m["mask"].sum() == 2
    kept = m["boxes"][m["mask"] > 0]
    assert (kept >= 0).all() and (kept <= W).all()
    # quadrant 3 box lands in bottom-right quadrant
    q3 = [b for b, c in zip(m["boxes"], m["classes"]) if c == 1][0]
    assert q3[0] >= W // 2 and q3[1] >= H // 2


def test_amplitude_jitter_positive():
    rng = np.random.default_rng(1)
    img = np.random.default_rng(2).uniform(0, 1, (8, 8, 1)).astype(np.float32)
    out = amplitude_jitter(img, rng)
    assert out.shape == img.shape and (out >= 0).all()


def test_augment_detection_batch_shapes():
    rng = np.random.default_rng(3)
    batch = {
        "images": np.random.default_rng(4).uniform(0, 1, (4, 32, 32, 3)).astype(np.float32),
        "boxes": np.tile(np.asarray([[[4.0, 4, 10, 10]]], np.float32), (4, 1, 1)),
        "classes": np.zeros((4, 1), np.int32),
        "mask": np.ones((4, 1), np.float32),
    }
    out = augment_detection_batch(batch, rng, mosaic_prob=1.0, flip_prob=1.0,
                                  jitter_prob=1.0)
    assert out["images"].shape == batch["images"].shape
    assert out["boxes"].shape == batch["boxes"].shape
    kept = out["boxes"][out["mask"] > 0]
    assert (kept[:, 2] > kept[:, 0]).all()
