"""Test configuration: force an 8-device virtual CPU platform so multi-chip sharding
paths (mesh/pjit) are exercised without TPU hardware (the reference has no analog —
its distributed code was only runnable on a real cluster; SURVEY.md section 4)."""

import os

# The TPU session environment registers its PJRT plugin from sitecustomize at
# interpreter startup (jax is already imported by the time conftest runs), so setting
# JAX_PLATFORMS via os.environ here is too late.  jax.config.update works as long as
# no backend has been initialized yet, which is guaranteed at collection time.
# Set PTT_TPU_TEST_PLATFORM=tpu to run the suite against real hardware instead.
if os.environ.get("PTT_TPU_TEST_PLATFORM", "cpu") == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
