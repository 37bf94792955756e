"""Checkpoint compatibility: torch .pth and HF safetensors importers."""

from pautdx.compat.torch_import import (  # noqa: F401
    batchnorm1d, conv1d, depthwise_conv1d, import_msc, layernorm, linear,
    load_state_dict, mha_to_tiny,
)
