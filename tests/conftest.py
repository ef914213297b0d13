"""Test environment: run everything on CPU with an 8-device virtual mesh so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force override: the container exports JAX_PLATFORMS=axon (TPU tunnel);
# tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual device threads share ONE physical core here: XLA:CPU's
# collective rendezvous defaults (warn 20 s, LOG(FATAL) at 40 s) are tuned
# for real multi-core hosts and flakily abort the whole pytest process when
# the scheduler starves two device threads past the terminate timeout
# (observed on collective-permute; pytest's capture swallowed the F-lines).
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
