"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding is validated on virtual CPU devices
(`xla_force_host_platform_device_count`), per the repo build contract.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and resets
# jax_platforms to "axon,cpu" at interpreter start; put it back to pure CPU
# BEFORE any backend initializes so tests never dispatch over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/pautdx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from pautdx.data import synthetic  # noqa: E402


@pytest.fixture(scope="session")
def volume_spec():
    return synthetic.VolumeSpec(n_beams=6, n_scans=80, n_samples=320, seed=7)


@pytest.fixture(scope="session")
def synth_volume(volume_spec):
    vol, defects = synthetic.generate_volume(volume_spec)
    return vol, defects


@pytest.fixture(scope="session")
def json_volume_dir(tmp_path_factory, volume_spec):
    d = tmp_path_factory.mktemp("json_volumes")
    synthetic.write_json_volume(str(d / "vol0.json"), volume_spec)
    spec2 = synthetic.VolumeSpec(n_beams=6, n_scans=80, n_samples=320, seed=11)
    synthetic.write_json_volume(str(d / "vol1.json"), spec2)
    return str(d)


@pytest.fixture(scope="session")
def txt_tree_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("txt_tree")
    spec = synthetic.VolumeSpec(n_beams=5, n_scans=24, n_samples=160, seed=3)
    defects = synthetic.write_txt_tree(str(d), spec, file_folder="fileA")
    return str(d), defects


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
