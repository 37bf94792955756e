"""Ultralytics YOLO checkpoint -> pautdx JAX YOLO converter.

The reference fine-tunes Ultralytics checkpoints (``yolov5su.pt``
`BscanBased/yolo5s_retrain.py:4-17`, ``yolov8n``/``yolov9c-seg``
`yolo_seg_train.py:5-19`); this converter loads those weights into the
JAX :class:`pautdx.models.vision.yolo.YOLO`, whose module tree is
structurally aligned with Ultralytics (see yolo.py docstring).

Input is a FLAT torch state dict (``{key: ndarray}``). Two ways to get
one from a ``.pt`` file:

- with the ``ultralytics`` package installed (not in this image):
  ``torch.save(YOLO("yolov8n.pt").model.state_dict(), "sd.pt")``;
- or ``torch.load(path, weights_only=False)["model"].state_dict()``
  when the pickle can be resolved.

The mapping is a pure key translation: Ultralytics's
``model.{layer_idx}.{submodule...}`` grammar -> our named flax tree,
via the per-flavour layer tables below (yolov8 / yolov5 / yolov9c /
yolo11 yaml layer indices). Submodule names inside a layer mirror the
torch tree exactly (cv1/cv2.0/m.N/attn.qkv/...), so no per-block rules
are needed.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from pautdx.compat.dfine_import import _flatten, _rebuild

# layer index -> pautdx module base path (yolov8.yaml)
_V8_TABLE = {
    0: "backbone.stem", 1: "backbone.down1", 2: "backbone.c1",
    3: "backbone.down2", 4: "backbone.c2", 5: "backbone.down3",
    6: "backbone.c3", 7: "backbone.down4", 8: "backbone.c4",
    9: "backbone.sppf",
    12: "neck.td4", 15: "neck.td3", 16: "neck.d3", 18: "neck.bu4",
    19: "neck.d4", 21: "neck.bu5",
    22: "HEAD",
}

# yolov5.yaml (u-variant) indices: lateral convs + shifted head
_V5_TABLE = {
    0: "backbone.stem", 1: "backbone.down1", 2: "backbone.c1",
    3: "backbone.down2", 4: "backbone.c2", 5: "backbone.down3",
    6: "backbone.c3", 7: "backbone.down4", 8: "backbone.c4",
    9: "backbone.sppf",
    10: "neck.lat5", 13: "neck.td4", 14: "neck.lat4", 17: "neck.td3",
    18: "neck.d3", 20: "neck.bu4", 21: "neck.d4", 23: "neck.bu5",
    24: "HEAD",
}

# yolov9c(-seg).yaml indices: GELAN stages, ADown downsamplers, SPPELAN
_V9C_TABLE = {
    0: "backbone.stem", 1: "backbone.down1", 2: "backbone.c1",
    3: "backbone.down2", 4: "backbone.c2", 5: "backbone.down3",
    6: "backbone.c3", 7: "backbone.down4", 8: "backbone.c4",
    9: "backbone.sppf",
    12: "neck.td4", 15: "neck.td3", 16: "neck.d3", 18: "neck.bu4",
    19: "neck.d4", 21: "neck.bu5",
    22: "HEAD",
}

# yolo11.yaml indices: C3k2 stages + C2PSA at 10, head shifted to 23
_V11_TABLE = {
    0: "backbone.stem", 1: "backbone.down1", 2: "backbone.c1",
    3: "backbone.down2", 4: "backbone.c2", 5: "backbone.down3",
    6: "backbone.c3", 7: "backbone.down4", 8: "backbone.c4",
    9: "backbone.sppf", 10: "backbone.psa",
    13: "neck.td4", 16: "neck.td3", 17: "neck.d3", 19: "neck.bu4",
    20: "neck.d4", 22: "neck.bu5",
    23: "HEAD",
}


def _normalize_keys(torch_sd: Dict[str, np.ndarray]
                    ) -> Tuple[Dict[str, np.ndarray], list]:
    """Strip leading 'model.' wrappers until keys start with an int.

    Returns (normalized dict, keys with no digit segment) — the latter
    (e.g. a 'stride' buffer) must surface in unused_torch_keys, not
    vanish before accounting."""
    out = {}
    undigited = []
    for k, v in torch_sd.items():
        parts = k.split(".")
        while parts and not parts[0].isdigit():
            parts = parts[1:]
        if parts:
            out[".".join(parts)] = v
        else:
            undigited.append(k)
    return out, undigited


def _head_path(rest: str) -> Tuple[str, str]:
    """Map a Detect/Segment sub-key to (pautdx module base, remainder)."""
    if rest.startswith("proto."):
        return "proto", rest[len("proto."):]
    if rest.startswith("cv4."):
        m = re.match(r"(cv4\.\d+\.\d+)\.(.*)", rest)
        return f"mask_head.{m.group(1)}", m.group(2)
    m = re.match(r"(cv[23]\.\d+\.\d+)\.(.*)", rest)
    if m is None:
        return "", rest                     # dfl etc. -> skipped by caller
    return f"head.{m.group(1)}", m.group(2)


def convert_yolo_state_dict(torch_sd: Dict[str, np.ndarray],
                            target_variables: Dict,
                            flavour: str = "v8"
                            ) -> Tuple[Dict, List[str]]:
    """Return (variables, unused_torch_keys); raises on unmatched targets."""
    tables = {"v8": _V8_TABLE, "v5": _V5_TABLE, "v9c": _V9C_TABLE,
              "v11": _V11_TABLE}
    if flavour not in tables:
        raise ValueError(f"unsupported flavour {flavour!r} "
                         f"(known: {sorted(tables)})")
    table = tables[flavour]
    sd, undigited = _normalize_keys(torch_sd)

    new_params: Dict[str, np.ndarray] = {}
    new_stats: Dict[str, np.ndarray] = {}
    used = set()
    for key, val in sd.items():
        val = np.asarray(val)
        idx_s, rest = key.split(".", 1)
        base = table.get(int(idx_s))
        if base is None:
            continue                               # upsample/concat layers
        if base == "HEAD":
            base, rest = _head_path(rest)
            if not base:                           # dfl fixed conv etc.
                continue
        # split off the torch leaf
        mod, _, leaf = rest.rpartition(".")
        path = f"{base}.{mod}" if mod else base
        if leaf == "num_batches_tracked":
            used.add(key)
            continue
        if mod.endswith("bn") or mod == "bn":
            if leaf == "weight":
                new_params[f"{path}.scale"] = val
            elif leaf == "bias":
                new_params[f"{path}.bias"] = val
            elif leaf == "running_mean":
                new_stats[f"{path}.mean"] = val
            elif leaf == "running_var":
                new_stats[f"{path}.var"] = val
            else:
                continue
            used.add(key)
            continue
        if leaf == "weight":
            if val.ndim == 4:
                if mod.endswith("upsample") or mod == "upsample":
                    # ConvTranspose2d (I, O, kh, kw) -> (kh, kw, I, O)
                    val = np.transpose(val, (2, 3, 0, 1))
                else:
                    val = np.transpose(val, (2, 3, 1, 0))
            new_params[f"{path}.kernel"] = val
            used.add(key)
        elif leaf == "bias":
            new_params[f"{path}.bias"] = val
            used.add(key)

    # validate against the target tree and rebuild
    params_flat = _flatten(dict(target_variables["params"]))
    stats_flat = _flatten(dict(target_variables.get("batch_stats", {})))
    missing = [p for p in params_flat if p not in new_params]
    missing += [p for p in stats_flat if p not in new_stats]
    if missing:
        raise KeyError(f"{len(missing)} target leaves had no torch source, "
                       f"e.g. {sorted(missing)[:8]}")
    for p, tgt in params_flat.items():
        if tuple(np.shape(new_params[p])) != tuple(np.shape(tgt)):
            raise ValueError(f"shape mismatch at {p}: torch "
                             f"{np.shape(new_params[p])} vs "
                             f"{np.shape(tgt)}")
        new_params[p] = np.asarray(new_params[p]).astype(
            np.asarray(tgt).dtype)
    for p, tgt in stats_flat.items():
        if tuple(np.shape(new_stats[p])) != tuple(np.shape(tgt)):
            # a mis-shaped running stat would otherwise fail later at
            # apply time with a broadcast error far from the importer
            raise ValueError(f"shape mismatch at {p}: torch "
                             f"{np.shape(new_stats[p])} vs "
                             f"{np.shape(tgt)}")
        new_stats[p] = np.asarray(new_stats[p]).astype(np.asarray(tgt).dtype)

    variables = {"params": _rebuild(dict(target_variables["params"]),
                                    new_params)}
    if stats_flat:
        variables["batch_stats"] = _rebuild(
            dict(target_variables["batch_stats"]), new_stats)
    unused = [k for k in sd if k not in used] + undigited
    return variables, unused


def load_yolo_pt(path: str) -> Dict[str, np.ndarray]:
    """Best-effort .pt loader: raw state dicts always work; full
    Ultralytics pickles need the ultralytics package importable."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and hasattr(
            obj["model"], "state_dict"):
        sd = obj["model"].state_dict()
    elif isinstance(obj, dict):
        sd = obj.get("state_dict", obj)
    else:
        sd = obj.state_dict()
    return {k: v.float().cpu().numpy() if hasattr(v, "cpu") else
            np.asarray(v) for k, v in sd.items()}
