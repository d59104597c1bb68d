"""Test env: force an 8-device virtual CPU mesh before jax backends initialize.

This stands in for multi-chip TPU hardware (SURVEY §4): sharding/pjit tests
run against 8 virtual CPU devices. The container's sitecustomize registers the
axon TPU backend and overrides JAX_PLATFORMS at interpreter start, so plain
env vars are not enough — we re-override jax.config here (conftest runs before
any backend is initialized, which is what matters).

Set IEEE_TPU_TEST_ON_TPU=1 to run the suite against the real chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("IEEE_TPU_TEST_ON_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "e2e: slow end-to-end tier (full train loops / whole model zoo); "
        "run the fast core with `pytest -m 'not e2e'`",
    )
