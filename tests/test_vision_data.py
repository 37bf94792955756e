import numpy as np

from pautdx.data import synthetic
from pautdx.data.vision import (
    detection_frames_from_volume, letterbox, sequence_chunks,
)
from pautdx.data.volume import parse_json_volume


def _volume():
    spec = synthetic.VolumeSpec(n_beams=6, n_scans=80, n_samples=160, seed=5)
    defects = [synthetic.SyntheticDefect(1, 3, 10, 30, 0.3, 0.45),
               synthetic.SyntheticDefect(2, 4, 50, 70, 0.5, 0.6)]
    vol_arr, _ = synthetic.generate_volume(spec, defects)
    return parse_json_volume(synthetic.volume_to_json_dict(vol_arr, defects))


def test_detection_frames_shapes_and_targets():
    vol = _volume()
    frames = detection_frames_from_volume(vol, out_size=128, max_boxes=4)
    assert frames.images.shape == (80, 128, 128, 3)
    assert frames.boxes.shape == (80, 4, 4)
    # scans 10..30 have a defect box
    assert frames.mask[15].sum() >= 1
    assert frames.mask[0].sum() == 0
    # box coordinates inside the image
    b = frames.boxes[15, 0]
    assert 0 <= b[0] < b[2] <= 128 and 0 <= b[1] < b[3] <= 128
    n = frames.normalized_cxcywh()
    active = frames.mask > 0
    assert (n[active] >= 0).all() and (n[active] <= 1).all()


def test_sequence_chunks_require_gt():
    vol = _volume()
    frames = detection_frames_from_volume(vol, out_size=64, max_boxes=4)
    chunks = sequence_chunks(frames, seq_len=50, require_gt=True)
    assert len(chunks) >= 1
    for c in chunks:
        assert len(c) == 50
        assert c.mask.sum() >= 1
    all_chunks = sequence_chunks(frames, seq_len=50, require_gt=False)
    assert len(all_chunks) == 2  # ceil(80/50) with tail re-anchor


def test_letterbox_geometry():
    imgs = np.ones((2, 60, 100, 3), np.float32)
    out, scale, (px, py) = letterbox(imgs, 128)
    assert out.shape == (2, 128, 128, 3)
    assert abs(scale - 1.28) < 1e-9
    assert px == 0 and py == (128 - int(round(60 * 1.28))) // 2
    # content region is ones, padding is pad_value
    assert np.allclose(out[:, py + 2:py + 10, 2:10], 1.0, atol=1e-5)
    assert np.allclose(out[:, 0, 0], 114.0 / 255.0)
