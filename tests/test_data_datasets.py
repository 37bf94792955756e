import numpy as np

from pautdx.data import windowing
from pautdx.data.datasets import (
    BatchIterator, defect_focused, load_json_dir, train_val_split,
)


def test_chunked_windows_tail_reanchor():
    # 120 scans, seq 50 -> ceil(120/50)=3 windows; last re-anchored to 70
    ws = windowing.chunked_windows(120, 50)
    assert ws == [(0, 50), (50, 100), (70, 120)]
    assert windowing.chunked_windows(30, 50) == []
    assert windowing.chunked_windows(50, 50) == [(0, 50)]


def test_overlapping_windows_cover():
    ws = windowing.overlapping_windows(120, 50)
    assert ws[0][0] == 0 and ws[-1][1] == 120
    for a, b in ws:
        assert b - a == 50


def test_load_json_dir(json_volume_dir):
    ds = load_json_dir(json_volume_dir, seq_len=40)
    assert len(ds) == 2 * 6 * 2  # 2 files x 6 beams x ceil(80/40) windows
    assert ds.signals.shape[1:] == (40, 320)
    assert ds.labels.shape == (len(ds), 40)
    assert ds.positions.shape == (len(ds), 40, 2)
    assert set(np.unique(ds.labels)) <= {0.0, 1.0}
    # defect positions only where labels=1
    healthy = ds.labels == 0
    assert np.allclose(ds.positions[healthy], 0.0)


def test_defect_focused_balance(json_volume_dir):
    ds = load_json_dir(json_volume_dir, seq_len=40)
    bal = defect_focused(ds)
    per_window_defects = bal.labels.sum(axis=1)
    n_def = int((per_window_defects >= 1).sum())
    n_healthy = int((per_window_defects < 1).sum())
    assert n_healthy <= n_def
    only = defect_focused(ds, only_defective=True)
    assert (only.labels.sum(axis=1) >= 1).all()


def test_split_and_batch(json_volume_dir):
    ds = load_json_dir(json_volume_dir, seq_len=40)
    tr, va = train_val_split(ds, 0.25, seed=42)
    assert len(tr) + len(va) == len(ds)
    it = BatchIterator(tr, batch_size=4, seed=1)
    batches = list(it)
    assert len(batches) == len(tr) // 4
    b = batches[0]
    assert b["signals"].shape == (4, 40, 320)
    assert b["labels"].shape == (4, 40)
    assert b["sample_mask"].shape == (4,)
    # eval iterator pads the tail and masks it
    ev = BatchIterator(va, batch_size=4, shuffle=False, drop_remainder=False)
    evb = list(ev)
    total_real = sum(int(x["sample_mask"].sum()) for x in evb)
    assert total_real == len(va)
