"""Torch ``.pth`` -> flax params importers.

The reference's deployment surface includes trained torch checkpoints
(`signals/MultiSignalClassifier_model*.pth`, per-epoch trainer dicts,
SURVEY.md §5.4). These utilities convert torch state dicts into pautdx
module variables, including the torch ``nn.MultiheadAttention``
``in_proj_weight`` -> TinyMHA q/k/v/out split — the same conversion the
reference performs in `acc_metrics_hybrid_binary_dynamic_.py:32-70`
(``load_legacy_mha_checkpoint_into_tiny``).

Layout rules:
- Linear:  torch (out, in)      -> Dense kernel (in, out)
- Conv1d:  torch (out, in, k)   -> Conv kernel (k, in, out)
- BatchNorm1d: weight/bias -> scale/bias params; running stats -> batch_stats
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint as a flat name->numpy dict (no torch needed
    downstream). Accepts raw state dicts or trainer dicts with
    ``model_state_dict`` (the reference's per-epoch format)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in obj.items()}


def linear(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": sd[f"{prefix}.weight"].T.copy(),
            "bias": sd[f"{prefix}.bias"].copy()}


def conv1d(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    w = sd[f"{prefix}.weight"]              # (out, in, k)
    return {"kernel": np.transpose(w, (2, 1, 0)).copy(),
            "bias": sd[f"{prefix}.bias"].copy()}


def depthwise_conv1d(sd: Dict[str, np.ndarray], prefix: str
                     ) -> Dict[str, np.ndarray]:
    """torch grouped conv with groups=C: weight (C, 1, k) -> flax
    feature_group_count=C kernel (k, 1, C)."""
    w = sd[f"{prefix}.weight"]
    return {"kernel": np.transpose(w, (2, 1, 0)).copy(),
            "bias": sd[f"{prefix}.bias"].copy()}


def batchnorm1d(sd: Dict[str, np.ndarray], prefix: str
                ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": sd[f"{prefix}.weight"].copy(),
              "bias": sd[f"{prefix}.bias"].copy()}
    stats = {"mean": sd[f"{prefix}.running_mean"].copy(),
             "var": sd[f"{prefix}.running_var"].copy()}
    return params, stats


def layernorm(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"].copy(),
            "bias": sd[f"{prefix}.bias"].copy()}


def mha_to_tiny(sd: Dict[str, np.ndarray], prefix: str
                ) -> Dict[str, Dict[str, np.ndarray]]:
    """torch nn.MultiheadAttention -> TinyMHA param tree (in_proj split)."""
    if f"{prefix}.in_proj_weight" in sd:
        w = sd[f"{prefix}.in_proj_weight"]
        b = sd[f"{prefix}.in_proj_bias"]
        d = w.shape[1]
        wq, wk, wv = w[:d], w[d:2 * d], w[2 * d:]
        bq, bk, bv = b[:d], b[d:2 * d], b[2 * d:]
    else:  # already-split q/k/v (TinyMHA-style torch checkpoints)
        wq, wk, wv = (sd[f"{prefix}.{n}.weight"] for n in ("q", "k", "v"))
        bq, bk, bv = (sd[f"{prefix}.{n}.bias"] for n in ("q", "k", "v"))
    return {
        "q_proj": {"kernel": wq.T.copy(), "bias": bq.copy()},
        "k_proj": {"kernel": wk.T.copy(), "bias": bk.copy()},
        "v_proj": {"kernel": wv.T.copy(), "bias": bv.copy()},
        "out_proj": {"kernel": sd[f"{prefix}.out_proj.weight"].T.copy(),
                     "bias": sd[f"{prefix}.out_proj.bias"].copy()},
    }


def import_msc(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """State dict of the gen-1 attention-MLP MultiSignalClassifier ->
    variables for ``pautdx.models.signal.MultiSignalClassifier``.

    Reference layout (`signals/MultiSignalClassifier_model*.pth`):
    shared_layer.{0,2} Linear, attention MHA, classifier.{0,2} Linear.
    """
    params = {
        "embed": {
            "Dense_0": linear(sd, "shared_layer.0"),
            "Dense_1": linear(sd, "shared_layer.2"),
        },
        "attn": mha_to_tiny(sd, "attention"),
        "head": {
            "Dense_0": linear(sd, "classifier.0"),
            "Dense_1": linear(sd, "classifier.2"),
        },
    }
    return {"params": params}


def import_set_transformer(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """`signals/set_transformer_model.pth` -> variables for
    ``pautdx.models.signal.SetTransformer`` (encoder.0 Linear, encoder.2/3
    attention blocks with post-norm, decoder MLP head)."""
    params = {
        "embed": linear(sd, "encoder.0"),
        "mab_0": mha_to_tiny(sd, "encoder.2.attention"),
        "norm_0": layernorm(sd, "encoder.2.layer_norm"),
        "mab_1": mha_to_tiny(sd, "encoder.3.attention"),
        "norm_1": layernorm(sd, "encoder.3.layer_norm"),
        "head": {
            "Dense_0": linear(sd, "decoder.0"),
            "Dense_1": linear(sd, "decoder.2"),
        },
    }
    return {"params": params}


def import_mlp_classifier(sd: Dict[str, np.ndarray],
                          prefix: str = "shared_layer") -> Dict[str, Any]:
    """Sequential Linear/ReLU stacks (`signal_classifier_model2.pth`
    prefix "shared_layer", `anomaly_detector_model.pth` prefix "network")
    -> variables for ``SignalClassifierMLP``."""
    idxs = sorted({int(k.split(".")[1]) for k in sd
                   if k.startswith(prefix + ".") and k.endswith(".weight")})
    mlp = {f"Dense_{i}": linear(sd, f"{prefix}.{j}")
           for i, j in enumerate(idxs)}
    return {"params": {"mlp": mlp}}
