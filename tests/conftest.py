"""Test configuration: force an 8-device virtual CPU platform.

This is the standard JAX mechanism for testing multi-device sharding without a
TPU pod (SURVEY.md §4 "Implication for the rebuild").

Note: pytest plugins (jaxtyping) import jax before this conftest runs, which
latches the JAX_PLATFORMS env default — so we must set the platform via
jax.config, not the environment. XLA_FLAGS is still read lazily at backend
initialization, which has not happened yet at conftest time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache makes repeated test runs dramatically faster.
os.makedirs("/tmp/jax_cache_tests", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU platform, got "
        f"{jax.default_backend()}")
    assert len(jax.devices()) == 8, (
        f"expected 8 virtual CPU devices, got {len(jax.devices())}")
