"""Test harness config.

Forces the CPU backend with 8 virtual devices so pjit/mesh/sharding paths are
exercised without a pod (SURVEY.md §4: multi-chip tests without a pod).
Pallas kernels detect the CPU backend and run in interpret mode.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment's sitecustomize prepends the experimental 'axon' TPU platform
# to jax_platforms regardless of JAX_PLATFORMS; override it explicitly so tests
# run on the 8-virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
