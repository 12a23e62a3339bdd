"""Test configuration: force an 8-device virtual CPU platform before JAX import.

This is the standard JAX mechanism for testing multi-device sharding without a
TPU pod (SURVEY.md §4 "Implication for the rebuild").
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
