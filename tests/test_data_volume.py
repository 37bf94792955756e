import numpy as np

from pautdx.data import synthetic
from pautdx.data.volume import (
    parse_json_volume, parse_txt_tree, volume_defect_boxes,
)


def test_parse_json_volume_shapes(json_volume_dir, volume_spec):
    import os
    path = os.path.join(json_volume_dir, "vol0.json")
    vol = parse_json_volume(path)
    assert vol.n_beams == volume_spec.n_beams
    arr = vol.beam_array()
    assert arr.shape == (volume_spec.n_beams, volume_spec.n_scans,
                         volume_spec.n_samples)
    # labels match the generating defects
    _, defects = synthetic.generate_volume(volume_spec)
    d = defects[0]
    bk = vol.beam_keys[d.beam_start]
    info = vol.scan_infos[bk][d.scan_start]
    assert info.is_defect
    assert np.allclose(info.position, (d.depth_start, d.depth_end), atol=1e-3)


def test_parse_txt_tree(txt_tree_dir):
    root, defects = txt_tree_dir
    vol = parse_txt_tree(root, "fileA")
    assert vol.n_beams == 5
    assert vol.beam_array().shape == (5, 24, 160)
    d = defects[0]
    info = vol.scan_infos[vol.beam_keys[d.beam_start]][d.scan_start]
    assert info.is_defect


def test_defect_boxes_adjacent_beam_merge():
    spec = synthetic.VolumeSpec(n_beams=6, n_scans=20, n_samples=64, seed=0)
    defects = [synthetic.SyntheticDefect(1, 3, 5, 8, 0.3, 0.4)]
    vol_arr, _ = synthetic.generate_volume(spec, defects)
    vol = parse_json_volume(synthetic.volume_to_json_dict(vol_arr, defects))
    boxes = volume_defect_boxes(vol)
    # scan 5 has one merged box spanning beams 1..3
    assert len(boxes["5.png"]) == 1
    bbox = boxes["5.png"][0]["bbox"]
    assert bbox[0] == 1 and bbox[1] == 3
    assert np.allclose(bbox[2:], (0.3, 0.4), atol=1e-3)
    # healthy scan has no boxes
    assert boxes["0.png"] == []
