import numpy as np

from pautdx.data import grammar


def test_parse_scan_key_health():
    info = grammar.parse_scan_key("12_Health")
    assert info.scan_key == "12"
    assert not info.is_defect
    assert info.binary_label == 0.0
    assert info.position == (0.0, 0.0)


def test_parse_scan_key_defect():
    info = grammar.parse_scan_key("3_Delamination_0.25-0.40")
    assert info.is_defect
    assert info.binary_label == 1.0
    assert np.allclose(info.position, (0.25, 0.40))


def test_parse_scan_key_malformed_range_falls_back_to_zero():
    info = grammar.parse_scan_key("3_FO_bad")
    assert info.is_defect
    assert info.position == (0.0, 0.0)


def test_parse_scan_filename():
    info = grammar.parse_scan_filename("7_Delamination_0.1000-0.2000.txt")
    assert info.scan_key == "7"
    assert info.label == "Delamination"
    assert np.allclose(info.position, (0.1, 0.2))
    h = grammar.parse_scan_filename("8_Health.txt")
    assert not h.is_defect


def test_beam_sorting():
    beams = ["b_10.0", "a_2.0", "c_-1.5"]
    assert grammar.sort_beams(beams) == ["c_-1.5", "a_2.0", "b_10.0"]


def test_scan_key_sorting_numeric():
    keys = ["10_Health", "2_Health", "1_FO_0.1-0.2"]
    assert grammar.sort_scan_keys(keys)[0] == "1_FO_0.1-0.2"


def test_roundtrip_make_parse():
    key = grammar.make_scan_key(5, "Crack", (0.3, 0.5))
    info = grammar.parse_scan_key(key)
    assert info.label == "Crack"
    assert np.allclose(info.position, (0.3, 0.5))
