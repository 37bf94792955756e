"""Raw PAUT volume parsers: txt trees and JSON volumes -> numpy arrays.

Reference behaviour being matched (not ported):
- txt tree parse + per-scan image assembly: `BscanBased/DS_preprocessing.py:53-141`
- JSON volume parse: `D-Fine/ds_manipulations/ds_prep.py:30-110`,
  `signals/improved_multisignal/json_dataset.py:28-160`

Both parsers produce a :class:`ParsedVolume`:
- ``signals``: dict ``beam_key -> (n_scans, n_samples) float32`` (scan-sorted)
- ``scan_infos``: dict ``beam_key -> [ScanInfo...]`` aligned with rows
- plus beam ordering/angle metadata for B-scan rendering.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Tuple

import numpy as np

from pautdx.data import grammar
from pautdx.data.grammar import ScanInfo


@dataclasses.dataclass
class ParsedVolume:
    """A PAUT volume with per-beam signals and per-scan labels."""

    beam_keys: List[str]                       # sorted by angle / order found
    beam_angles: List[float]
    signals: Dict[str, np.ndarray]             # beam_key -> (n_scans, n_samples)
    scan_infos: Dict[str, List[ScanInfo]]      # beam_key -> per-scan metadata

    @property
    def n_beams(self) -> int:
        return len(self.beam_keys)

    def beam_array(self) -> np.ndarray:
        """Stack beams -> (beams, scans, samples); requires rectangular volume."""
        return np.stack([self.signals[k] for k in self.beam_keys])

    def scan_image(self, scan_idx: int) -> np.ndarray:
        """B-scan image for one scan position: (beams, samples)."""
        return np.stack([self.signals[k][scan_idx] for k in self.beam_keys])


def parse_json_volume(path_or_dict, use_native: bool = True) -> ParsedVolume:
    """Parse the reference JSON-volume schema ``{beam: {scan_key: signal}}``.

    Scan values may be raw lists or ``{"signal": [...]}`` dicts
    (`json_dataset.py:111-116`). Scan keys are sorted by integer index.
    Path inputs route through the native one-pass C++ scanner when
    available (``pautdx.native.parse_json_volume_fast``, parity-tested);
    dict inputs and fallback use the pure-Python parser below.
    """
    if isinstance(path_or_dict, (str, os.PathLike)):
        if use_native:
            from pautdx import native
            if native.native_available():
                return native.parse_json_volume_fast(str(path_or_dict))
        with open(path_or_dict) as f:
            data = json.load(f)
    else:
        data = path_or_dict

    beam_keys = list(data.keys())
    try:
        beam_keys = grammar.sort_beams(beam_keys)
        angles = [grammar.beam_angle(k) for k in beam_keys]
    except (IndexError, ValueError):
        angles = list(range(len(beam_keys)))

    signals: Dict[str, np.ndarray] = {}
    infos: Dict[str, List[ScanInfo]] = {}
    for bk in beam_keys:
        beam = data[bk]
        keys = grammar.sort_scan_keys(list(beam.keys()))
        rows, row_infos = [], []
        for sk in keys:
            v = beam[sk]
            if isinstance(v, dict) and "signal" in v:
                v = v["signal"]
            rows.append(np.asarray(v, dtype=np.float32))
            row_infos.append(grammar.parse_scan_key(sk))
        # ragged guard: the reference drops mismatched-length windows later;
        # here we right-pad to the per-beam max and record true lengths via infos
        if rows:
            max_len = max(r.shape[0] for r in rows)
            rows = [
                r if r.shape[0] == max_len
                else np.pad(r, (0, max_len - r.shape[0]))
                for r in rows
            ]
            signals[bk] = np.stack(rows)
        else:
            signals[bk] = np.zeros((0, 0), np.float32)
        infos[bk] = row_infos
    return ParsedVolume(beam_keys, [float(a) for a in angles], signals, infos)


def _scan_index(filename: str):
    """Integer scan-index prefix of ``<int>_<label>.txt``, else None."""
    try:
        return int(filename.split("_")[0])
    except ValueError:
        return None


def parse_txt_tree(root: str, file_folder: str,
                   use_native: bool = True) -> ParsedVolume:
    """Parse ``root/<file_folder>/<beam>_<angle>/<scan>_<label>[_s-e].txt``.

    Matches `DS_preprocessing.py:53-97`: beams sorted by float angle, one
    float column per txt file, filename grammar for labels. The per-file
    read+parse runs through the native parallel mmap loader when the C++
    library is available (``pautdx.native.parse_ascan_tree_fast``);
    grouping/sorting semantics are identical either way.
    """
    base = os.path.join(root, file_folder)
    beams = grammar.sort_beams(os.listdir(base))
    angles = [grammar.beam_angle(b) for b in beams]

    tree = None
    if use_native:
        from pautdx import native
        tree = native.parse_ascan_tree_fast(base)

    signals: Dict[str, np.ndarray] = {}
    infos: Dict[str, List[ScanInfo]] = {}
    for beam in beams:
        beam_dir = os.path.join(base, beam)
        # .txt with an integer scan-index prefix only — the native walker
        # collects *.txt, so the Python listing must be at least as strict
        # or a stray file would KeyError the tree lookup / crash the
        # int() sort key (e.g. a dropped-in notes.txt)
        listing = os.listdir(beam_dir)
        indexed = sorted(
            (idx, f) for f in listing
            if f.endswith(".txt") and (idx := _scan_index(f)) is not None)
        files = [f for _, f in indexed]
        if not files and any(f.endswith(".txt") for f in listing):
            # every .txt failed the index filter: that's a naming-scheme
            # mismatch (e.g. 'scan12_...'), not stray files — an empty
            # volume here would silently train/eval on zeros
            raise ValueError(
                f"no scan files in {beam_dir} match the "
                f"'<int>_<label>.txt' grammar (example present: "
                f"{next(f for f in listing if f.endswith('.txt'))!r})")
        rows, row_infos = [], []
        for fn in files:
            row = tree.get(f"{beam}/{fn}") if tree is not None else None
            if row is None:
                row = np.loadtxt(os.path.join(beam_dir, fn), dtype=np.float32)
            rows.append(row)
            row_infos.append(grammar.parse_scan_filename(fn))
        signals[beam] = np.stack(rows) if rows else np.zeros((0, 0), np.float32)
        infos[beam] = row_infos
    return ParsedVolume(beams, angles, signals, infos)


def volume_defect_boxes(vol: ParsedVolume) -> Dict[str, list]:
    """Per-scan defect bboxes in (beam, depth) space with adjacent-beam merge.

    Reproduces the reference's merge heuristic
    (`DS_preprocessing.py:111-117`): walking beams in angle order, a defect
    on the next beam with identical depth range extends the previous bbox's
    beam end. bbox = [beam_idx_start, beam_idx_end, depth_start, depth_end]
    with beam indices as *positions in the sorted beam list* and depths
    normalized [0, 1]. Key: ``"<scanKey>.png"`` for annotation-schema parity.
    """
    n_scans = max((len(v) for v in vol.scan_infos.values()), default=0)
    ann: Dict[str, list] = {}
    for s in range(n_scans):
        key = f"{s}.png"
        ann[key] = []
        for b_idx, bk in enumerate(vol.beam_keys):
            infos = vol.scan_infos[bk]
            if s >= len(infos) or not infos[s].is_defect:
                continue
            d0, d1 = infos[s].position
            prev = ann[key][-1] if ann[key] else None
            if (prev is not None and prev["bbox"][2] == d0
                    and prev["bbox"][3] == d1 and prev["bbox"][1] == b_idx - 1):
                prev["bbox"][1] = b_idx
            else:
                ann[key].append(
                    {"bbox": [b_idx, b_idx, d0, d1], "label": infos[s].label}
                )
    return ann
