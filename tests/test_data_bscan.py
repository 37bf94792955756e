import numpy as np

from pautdx.data import synthetic
from pautdx.data.bscan import adjust_annotations, render_bscans, rotate90_cw
from pautdx.data.volume import parse_json_volume
from pautdx.data.bscan import render_volume_dataset


def test_rotate90_cw_matches_numpy():
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = np.asarray(rotate90_cw(img))
    assert np.allclose(out, np.rot90(img, k=-1))


def test_render_bscans_shapes_and_range():
    frames = np.random.default_rng(0).normal(size=(4, 6, 160)).astype(np.float32)
    imgs = np.asarray(render_bscans(frames, 320, 320))
    assert imgs.shape == (4, 320, 320)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0 + 1e-6


def test_adjust_annotations_x_inversion():
    ann = {"0.png": [{"bbox": [0, 2, 0.25, 0.5], "label": "Delamination"}]}
    adj = adjust_annotations(ann, n_beams=5, size=(320, 320))
    bbox = adj["0.png"][0]["bbox"]
    # beam 0 -> x=320 (inverted), beam 2 -> 320 - 320*2/4 = 160
    assert bbox[0] == 320 and bbox[1] == 160
    assert bbox[2] == 80 and bbox[3] == 160


def test_render_volume_dataset(json_volume_dir):
    import os
    vol = parse_json_volume(os.path.join(json_volume_dir, "vol0.json"))
    imgs, ann = render_volume_dataset(vol, 320, 320)
    assert imgs.shape[0] == vol.signals[vol.beam_keys[0]].shape[0]
    assert imgs.shape[1:] == (320, 320)
    assert len(ann) == imgs.shape[0]
    # defect scans have a stronger response in the defect depth band
    assert any(len(v) > 0 for v in ann.values())
