"""Test env: force the CPU backend with a virtual 8-device mesh so sharding
tests run anywhere; set RUN_TPU=1 to test on real TPU hardware instead."""

import os

if not os.environ.get("RUN_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # The axon TPU plugin re-registers itself over the env var; force via
    # config (must happen before any backend is initialized).
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
