"""Minimal ONNX weight extractor — no onnx/onnxruntime dependency.

The reference ships trained `.onnx` artifacts
(`signals/MultiSignalClassifier4_dynamic.onnx`, `test-FPD.onnx`) consumed
by its C# host. To verify parity against those artifacts in this
dependency-free environment, this module walks the ONNX protobuf wire
format directly and extracts the graph initializers (weights) by name.

Wire-format facts used (onnx.proto):
- ModelProto field 7  = graph (GraphProto, length-delimited)
- GraphProto field 5  = initializer (repeated TensorProto)
- TensorProto fields: 1 dims (int64, repeated), 2 data_type (enum),
  4 float_data (packed floats), 8 name (string), 9 raw_data (bytes)
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, Tuple

import numpy as np

_FLOAT = 1
_INT64 = 7


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload) over a proto message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:                      # varint
            val, i = _read_varint(buf, i)
            yield field, wire, val
        elif wire == 2:                    # length-delimited
            ln, i = _read_varint(buf, i)
            yield field, wire, buf[i:i + ln]
            i += ln
        elif wire == 5:                    # 32-bit
            yield field, wire, buf[i:i + 4]
            i += 4
        elif wire == 1:                    # 64-bit
            yield field, wire, buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_tensor(buf: bytes):
    dims = []
    dtype = _FLOAT
    name = ""
    raw = None
    floats = []
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 0:
            dims.append(val)
        elif field == 2 and wire == 0:
            dtype = val
        elif field == 8 and wire == 2:
            name = val.decode()
        elif field == 9 and wire == 2:
            raw = val
        elif field == 4 and wire == 2:     # packed float_data
            floats = list(struct.unpack(f"<{len(val) // 4}f", val))
        elif field == 4 and wire == 5:
            floats.append(struct.unpack("<f", val)[0])
    if raw is not None:
        if dtype == _FLOAT:
            arr = np.frombuffer(raw, np.float32)
        elif dtype == _INT64:
            arr = np.frombuffer(raw, np.int64)
        else:
            return name, None
    elif floats:
        arr = np.asarray(floats, np.float32)
    else:
        return name, None
    return name, arr.reshape(dims) if dims else arr


def load_onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    """All named weight tensors of an ONNX model."""
    with open(path, "rb") as f:
        model = f.read()
    graph = None
    for field, wire, val in _fields(model):
        if field == 7 and wire == 2:
            graph = val
            break
    if graph is None:
        raise ValueError("no GraphProto in model")
    out: Dict[str, np.ndarray] = {}
    for field, wire, val in _fields(graph):
        if field == 5 and wire == 2:
            name, arr = _parse_tensor(val)
            if arr is not None:
                out[name] = arr
    return out


def import_msc_onnx(path: str) -> Dict:
    """Reference MSC `.onnx` -> variables for
    ``pautdx.models.signal.MultiSignalClassifier``.

    The exporter (`signals/resaveModelOnnx.py:36-60`) constant-folds the
    Linear weights into ``onnx::MatMul_*`` operands (already in x@W
    layout); biases and the attention projections keep their torch names.
    """
    w = load_onnx_initializers(path)
    matmuls = sorted((k for k in w if k.startswith("onnx::MatMul")),
                     key=lambda k: int(k.rsplit("_", 1)[1]))
    in_proj_xw, head0_xw, head1_xw = (w[k] for k in matmuls)
    d = in_proj_xw.shape[0]
    b = w["attention.in_proj_bias"]
    params = {
        "embed": {
            "Dense_0": {"kernel": w["shared_layer.0.weight"].T.copy(),
                        "bias": w["shared_layer.0.bias"].copy()},
            "Dense_1": {"kernel": w["shared_layer.2.weight"].T.copy(),
                        "bias": w["shared_layer.2.bias"].copy()},
        },
        "attn": {
            "q_proj": {"kernel": in_proj_xw[:, :d].copy(), "bias": b[:d].copy()},
            "k_proj": {"kernel": in_proj_xw[:, d:2 * d].copy(),
                       "bias": b[d:2 * d].copy()},
            "v_proj": {"kernel": in_proj_xw[:, 2 * d:].copy(),
                       "bias": b[2 * d:].copy()},
            "out_proj": {"kernel": w["attention.out_proj.weight"].T.copy(),
                         "bias": w["attention.out_proj.bias"].copy()},
        },
        "head": {
            "Dense_0": {"kernel": head0_xw.copy(),
                        "bias": w["classifier.0.bias"].copy()},
            "Dense_1": {"kernel": head1_xw.copy(),
                        "bias": w["classifier.2.bias"].copy()},
        },
    }
    return {"params": params}
