"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Multi-chip sharding is validated on host CPU devices; numerical parity tests
use float64 oracles. Env vars are set too late here (a pytest plugin imports
jax before conftest), so we use jax.config.update, which works any time
before the backend is first initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any late spawned code paths

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

from slamtpu.runtime.jaxcache import enable_persistent_cache

enable_persistent_cache()


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}"
    )
    assert jax.device_count() == 8, f"expected 8 CPU devices, got {jax.device_count()}"
