"""Test configuration: force an 8-device virtual CPU mesh (SURVEY.md section 4
test strategy) so multi-chip sharding paths are exercised without TPU
hardware. Must run before jax initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) pins jax_platforms="axon,cpu"; the env
# var alone is not enough — override the config before backends initialize.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_imagefolder(tmp_path_factory):
    from facerec_tpu.data.synthetic import write_synthetic_imagefolder

    root = tmp_path_factory.mktemp("synth_ds")
    write_synthetic_imagefolder(root, num_classes=4, per_class=9, size=64, seed=7)
    return root


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
