"""HF D-FINE checkpoint -> pautdx JAX D-FINE converter.

Generic by construction: pautdx vision modules name their flax submodules
with the same flattened dotted paths as the HF torch modules, so the
conversion is a pure leaf-level transform keyed on the flattened path:

- ``<p>.kernel``    <- ``<p>.weight``  (4D conv  -> (kh, kw, I, O);
                                        2D linear -> (I, O); 3D conv1d)
- ``<p>.scale``     <- ``<p>.weight``  (BN/LN/GN) or direct ``<p>.scale``
- ``<p>.bias``      <- ``<p>.bias``
- ``<p>.embedding`` <- ``<p>.weight``
- batch_stats ``<p>.mean/var`` <- ``<p>.running_mean/running_var``

Works with HF ``DFineForObjectDetection.state_dict()`` (and any other
torch model whose tree pautdx mirrors). Unmatched torch buffers
(``anchors``, ``num_points_scale``, denoising embeddings, ...) are
reported, not fatal; unmatched *target* leaves raise.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _flatten(tree: Dict, prefix: Tuple[str, ...] = ()) -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
            out.update(_flatten(dict(v), prefix + (str(k),)))
        else:
            out[".".join(prefix + (str(k),))] = v
    return out


def _rebuild(tree: Dict, flat: Dict[str, Any],
             prefix: Tuple[str, ...] = ()) -> Dict:
    """Inverse of _flatten: pour a flat {dotted.path: leaf} dict back
    into the nesting of ``tree``."""
    out = {}
    for k, v in dict(tree).items():
        if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
            out[k] = _rebuild(dict(v), flat, prefix + (str(k),))
        else:
            out[k] = flat[".".join(prefix + (str(k),))]
    return out


def convert_state_dict(torch_sd: Dict[str, np.ndarray],
                       target_variables: Dict) -> Tuple[Dict, List[str]]:
    """Return (variables, unused_torch_keys). Raises on unmatched target."""
    params_flat = _flatten(dict(target_variables["params"]))
    stats_flat = _flatten(dict(target_variables.get("batch_stats", {})))
    used = set()
    missing: List[str] = []

    def grab(key):
        used.add(key)
        return np.asarray(torch_sd[key])

    def convert_leaf(path: str, target) -> np.ndarray:
        prefix, leaf = path.rsplit(".", 1) if "." in path else ("", path)
        tshape = tuple(target.shape)
        if leaf == "kernel" and f"{prefix}.weight" in torch_sd:
            w = grab(f"{prefix}.weight")
            if w.ndim == 4:
                # assumes Conv2d (out, in, kh, kw). A ConvTranspose2d
                # source stores (in, out, kh, kw) and would convert
                # silently transposed when in == out — callers with
                # deconvs must pre-swap (see yolo_import's special case)
                w = np.transpose(w, (2, 3, 1, 0))
            elif w.ndim == 3:
                w = np.transpose(w, (2, 1, 0))
            else:
                w = w.T
        elif leaf == "scale" and (path in torch_sd
                                  or f"{prefix}.weight" in torch_sd):
            w = grab(path) if path in torch_sd else grab(f"{prefix}.weight")
        elif leaf == "bias" and f"{prefix}.bias" in torch_sd:
            w = grab(f"{prefix}.bias")
        elif leaf == "embedding" and f"{prefix}.weight" in torch_sd:
            w = grab(f"{prefix}.weight")
        elif path in torch_sd:
            w = grab(path)
        else:
            missing.append(path)
            return np.asarray(target)
        if tuple(w.shape) != tshape:
            raise ValueError(f"shape mismatch at {path}: torch {w.shape} "
                             f"vs target {tshape}")
        return w.astype(np.asarray(target).dtype)

    new_params = {p: convert_leaf(p, v) for p, v in params_flat.items()}
    new_stats: Dict[str, np.ndarray] = {}
    for path, v in stats_flat.items():
        prefix, leaf = path.rsplit(".", 1)
        key = {"mean": f"{prefix}.running_mean",
               "var": f"{prefix}.running_var"}.get(leaf)
        if key is not None and key in torch_sd:
            used.add(key)
            new_stats[path] = np.asarray(torch_sd[key]).astype(
                np.asarray(v).dtype)
        else:
            missing.append(path)
            new_stats[path] = np.asarray(v)

    # modules that may legitimately be absent in the torch source (e.g.
    # denoising embeddings when the checkpoint trained with num_denoising=0)
    hard_missing = [m for m in missing if "denoising" not in m]
    if hard_missing:
        raise KeyError(f"{len(hard_missing)} target leaves had no torch "
                       f"source, e.g. {hard_missing[:8]}")

    variables = {"params": _rebuild(dict(target_variables["params"]),
                                    new_params)}
    if stats_flat:
        variables["batch_stats"] = _rebuild(
            dict(target_variables["batch_stats"]), new_stats)
    unused = [k for k in torch_sd if k not in used]
    return variables, unused


def load_torch_model_state(model) -> Dict[str, np.ndarray]:
    """torch nn.Module -> flat numpy state dict (buffers included)."""
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def export_state_dict(variables: Dict,
                      torch_sd_template: Dict[str, np.ndarray]
                      ) -> Dict[str, np.ndarray]:
    """pautdx JAX variables -> torch-shaped numpy state dict.

    Inverse of :func:`convert_state_dict`: every template key is filled
    from the matching JAX leaf with the transpose undone; keys with no
    JAX counterpart (anchor buffers, ``num_points_scale``, ...) keep the
    template's own values — correct because the template comes from a
    torch model instantiated with the same config, and those buffers are
    config-derived constants. Enables JAX-trained weights to run through
    the HF torch model (mAP-parity evidence for BASELINE configs 4-5).
    """
    params_flat = _flatten(dict(variables["params"]))
    stats_flat = _flatten(dict(variables.get("batch_stats", {})))

    def lookup(flat: Dict[str, Any], prefix: str, leaf: str):
        """Find `<prefix>.<leaf>`, resolving torch tied-weight aliases
        (HF exposes the top-level heads again under model.decoder.*)."""
        for p in (prefix,
                  prefix[len("model.decoder."):]
                  if prefix.startswith("model.decoder.") else None,
                  prefix[len("model."):]
                  if prefix.startswith("model.") else None):
            if p is not None and f"{p}.{leaf}" in flat:
                return flat[f"{p}.{leaf}"]
        return None

    out: Dict[str, np.ndarray] = {}
    for tkey, tval in torch_sd_template.items():
        tval = np.asarray(tval)
        prefix, leaf = tkey.rsplit(".", 1) if "." in tkey else ("", tkey)
        w = None
        if leaf == "weight":
            k = lookup(params_flat, prefix, "kernel")
            if k is not None:
                k = np.asarray(k)
                if k.ndim == 4:
                    w = np.transpose(k, (3, 2, 0, 1))
                elif k.ndim == 3:
                    w = np.transpose(k, (2, 1, 0))
                else:
                    w = k.T
            elif lookup(params_flat, prefix, "scale") is not None:
                w = np.asarray(lookup(params_flat, prefix, "scale"))
            elif lookup(params_flat, prefix, "embedding") is not None:
                w = np.asarray(lookup(params_flat, prefix, "embedding"))
        elif leaf == "bias":
            b = lookup(params_flat, prefix, "bias")
            w = None if b is None else np.asarray(b)
        elif leaf == "running_mean":
            m = lookup(stats_flat, prefix, "mean")
            w = None if m is None else np.asarray(m)
        elif leaf == "running_var":
            v = lookup(stats_flat, prefix, "var")
            w = None if v is None else np.asarray(v)
        elif tkey in params_flat:
            w = np.asarray(params_flat[tkey])
        if w is None:
            out[tkey] = tval                       # config-derived buffer
            continue
        if tuple(w.shape) != tuple(tval.shape):
            raise ValueError(f"shape mismatch at {tkey}: jax {w.shape} "
                             f"vs torch {tval.shape}")
        out[tkey] = w.astype(tval.dtype)
    return out
