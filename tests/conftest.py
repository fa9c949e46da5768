"""Test env: force JAX onto CPU with 8 virtual devices so sharding logic is
exercised without TPU hardware (SURVEY.md §4 test strategy).

The container's sitecustomize pre-registers a remote TPU backend and forces
JAX_PLATFORMS=axon; backends are created lazily, so overriding the config
here (before any jax op runs) still lands us on the fast local CPU client.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# inherited by tool subprocesses; honored in gsl_tpu/__init__ (the
# container's sitecustomize clobbers JAX_PLATFORMS there)
os.environ["GSL_PLATFORM"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """The full suite compiles hundreds of executables in one process; the
    XLA CPU compiler has been observed to segfault near the end under that
    accumulation. Dropping compiled-computation caches between modules
    keeps the process well under the threshold."""
    yield
    jax.clear_caches()
