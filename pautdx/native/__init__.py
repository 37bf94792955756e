"""Native (C++) IO acceleration with transparent build + Python fallback.

The shared library is compiled from ``pautdx_io.cpp`` on first use with
``g++ -O3 -shared -fPIC`` and cached next to the source; every entry point
falls back to the pure-numpy implementation if the toolchain or build is
unavailable, so the framework never hard-depends on the native path.

Public API:
- :func:`load_ascan_txt`      — fast ``np.loadtxt`` replacement
- :func:`parse_json_volume_fast` — one-pass JSON volume -> ParsedVolume
- :func:`native_available`
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pautdx_io.cpp")
_LIB_PATH = os.path.join(_HERE, "_pautdx_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-pthread", "-o", _LIB_PATH, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.parse_floats_file.restype = ctypes.c_int64
        lib.parse_floats_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.parse_json_volume_floats.restype = ctypes.c_int64
        lib.parse_json_volume_floats.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.parse_ascan_tree.restype = ctypes.c_int64
        lib.parse_ascan_tree.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]
        return lib
    except Exception:
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_ascan_txt(path: str, max_samples: int = 1 << 20) -> np.ndarray:
    """Float-per-line A-scan file -> float32 array (np.loadtxt parity)."""
    lib = _get_lib()
    if lib is None:
        return np.loadtxt(path, dtype=np.float32).reshape(-1)
    out = np.empty(max_samples, np.float32)
    n = lib.parse_floats_file(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples)
    if n == -2:
        raise ValueError(f"malformed float token in {path}")
    if n < 0:
        raise FileNotFoundError(path)
    return out[:n].copy()


def parse_json_volume_fast(path: str,
                           value_capacity: int = 1 << 26,
                           key_capacity: int = 1 << 22):
    """One-pass native JSON volume parse -> ParsedVolume (falls back to
    the Python parser on any failure)."""
    from pautdx.data import grammar
    from pautdx.data.volume import ParsedVolume, parse_json_volume

    lib = _get_lib()
    if lib is None:
        return parse_json_volume(path, use_native=False)
    values = np.empty(value_capacity, np.float32)
    lengths = np.empty(1 << 20, np.int64)
    keys = ctypes.create_string_buffer(key_capacity)
    n_values = ctypes.c_int64()
    n_arrays = ctypes.c_int64()
    n_key_bytes = ctypes.c_int64()
    rc = lib.parse_json_volume_floats(
        path.encode(),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), value_capacity,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 1 << 20,
        keys, key_capacity,
        ctypes.byref(n_values), ctypes.byref(n_arrays),
        ctypes.byref(n_key_bytes))
    if rc != 0:
        return parse_json_volume(path, use_native=False)
    all_keys = keys.raw[: n_key_bytes.value].decode().split("\n")[:-1]
    n_arr = n_arrays.value
    # keys arrive in document order: beam key, then its scan keys (one per
    # array). Group: a key is a beam key iff it is NOT followed by an array
    # before the next key... we reconstruct via counts: each scan key owns
    # exactly one array, beams own zero. Walk keys and assign arrays.
    if len(all_keys) != n_arr + _count_beams(all_keys, n_arr):
        return parse_json_volume(path, use_native=False)  # schema mismatch

    offsets = np.concatenate([[0], np.cumsum(lengths[:n_arr])])
    signals = {}
    infos = {}
    beam_keys = []
    ai = 0
    ki = 0
    # beams appear in key stream followed by their scan keys; a beam is a
    # key whose following keys (until next beam) each consume one array.
    # We detect beams structurally: total keys = beams + arrays, and the
    # JSON schema nests exactly two levels, so the first key is a beam and
    # every subsequent key is a scan key unless all previous beam's arrays
    # are exhausted. Simpler: re-walk using the invariant that scan counts
    # per beam equal arrays between beam keys.
    # Fallback to Python parser if anything looks off.
    try:
        i = 0
        while i < len(all_keys):
            bk = all_keys[i]
            i += 1
            rows = []
            row_infos = []
            while i < len(all_keys) and ai < n_arr:
                sk = all_keys[i]
                # a beam key is followed by scan keys; the next beam key
                # begins after this beam's scans. We can't distinguish
                # lexically, so use the scan-key grammar (leading int).
                try:
                    int(sk.split("_")[0])
                except ValueError:
                    break
                a, b = offsets[ai], offsets[ai + 1]
                rows.append((sk, values[a:b].copy()))
                ai += 1
                i += 1
            rows.sort(key=lambda kv: int(kv[0].split("_")[0]))
            if rows:
                max_len = max(r.shape[0] for _, r in rows)
                mat = np.zeros((len(rows), max_len), np.float32)
                for j, (_, r) in enumerate(rows):
                    mat[j, :r.shape[0]] = r
                signals[bk] = mat
                infos[bk] = [grammar.parse_scan_key(k) for k, _ in rows]
                beam_keys.append(bk)
        try:
            beam_keys = grammar.sort_beams(beam_keys)
            angles = [grammar.beam_angle(k) for k in beam_keys]
        except (IndexError, ValueError):
            angles = list(range(len(beam_keys)))
        return ParsedVolume(beam_keys, [float(a) for a in angles],
                            signals, infos)
    except Exception:
        return parse_json_volume(path, use_native=False)


def _count_beams(all_keys, n_arrays: int) -> int:
    return len(all_keys) - n_arrays


def parse_ascan_tree_fast(base_dir: str,
                          value_capacity: int = 0,
                          n_threads: int = 0):
    """Parallel mmap parse of an A-scan txt tree (``base/<beam>/<scan>.txt``).

    Returns ``{relpath: float32 array}`` in walk order, or ``None`` when
    the native library is unavailable / reports an error (callers fall
    back to the per-file Python loop). The directory walk, the mmap'd
    float parsing, and the thread pool all live in C++
    (``pautdx_io.cpp::parse_ascan_tree``).
    """
    lib = _get_lib()
    if lib is None:
        return None
    if not value_capacity:
        # one float per ~2 text bytes is a safe upper bound; sizing from
        # the real tree keeps the output buffer (and its page faults)
        # proportional to the data instead of a fixed huge allocation
        total = sum(os.path.getsize(os.path.join(r, f))
                    for r, _, fs in os.walk(base_dir) for f in fs)
        value_capacity = max(total // 2 + 4096, 1 << 16)
    values = np.empty(value_capacity, np.float32)
    lengths = np.empty(1 << 20, np.int64)
    paths = ctypes.create_string_buffer(1 << 22)
    n_files = ctypes.c_int64()
    n_values = ctypes.c_int64()
    n_path_bytes = ctypes.c_int64()
    rc = lib.parse_ascan_tree(
        base_dir.encode(),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), value_capacity,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 1 << 20,
        paths, 1 << 22,
        ctypes.byref(n_files), ctypes.byref(n_values),
        ctypes.byref(n_path_bytes), n_threads)
    if rc != 0:
        return None
    rel = paths.raw[: n_path_bytes.value].decode().split("\n")[:-1]
    offsets = np.concatenate([[0], np.cumsum(lengths[: n_files.value])])
    return {rel[i]: values[offsets[i]:offsets[i + 1]].copy()
            for i in range(n_files.value)}
