"""Test environment: CPU backend with 8 virtual devices for mesh tests.

Must run before jax is imported anywhere (pytest imports conftest first).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The environment's sitecustomize imports jax with JAX_PLATFORMS=axon (the
# TPU tunnel), which latches into jax.config before this file runs and costs
# ~40 s of tunnel setup on first use. Force the CPU backend in-process.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


CORNELL_JSON = os.path.join(os.path.dirname(__file__), "data", "cornell_box.json")


@pytest.fixture(scope="session")
def cornell_path():
    return CORNELL_JSON
