"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax and registers the TPU plugin at
interpreter startup, so JAX_PLATFORMS from the environment is already latched
by the time this file runs. Backends are not *initialized* until first use
though, so jax.config.update + XLA_FLAGS here still take effect. Tests run on
CPU for determinism/speed, with 8 virtual devices so multi-chip sharding
paths can be exercised without real hardware (SURVEY.md section 4, item 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
