"""Test environment: run everything on CPU with an 8-device virtual mesh so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force override: the container exports JAX_PLATFORMS=axon (TPU tunnel);
# tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
