"""Test harness config: run on CPU with 8 virtual devices.

The standard JAX trick for exercising pjit/shard_map collectives without a
pod: force the host platform and fake 8 devices (SURVEY.md §4d).  Must run
before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the harness may preset e.g. "axon"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A sitecustomize hook may have force-registered a TPU backend already;
# config.update wins over whatever it set.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
