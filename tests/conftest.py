"""Test configuration: force an 8-device virtual CPU platform so multi-chip sharding
paths (mesh/pjit) are exercised without TPU hardware (the reference has no analog —
its distributed code was only runnable on a real cluster; SURVEY.md section 4)."""

import os

# Force-override: the session env pre-sets JAX_PLATFORMS to the TPU plugin; unit tests
# must run on the virtual 8-device CPU platform for determinism and mesh coverage.
# Set PTT_TPU_TEST_PLATFORM=tpu to run the suite against real hardware instead.
if os.environ.get("PTT_TPU_TEST_PLATFORM", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
