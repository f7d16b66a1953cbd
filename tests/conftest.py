"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip hardware is unavailable in CI; all sharding/collective tests run on
a CPU-simulated mesh (jax.sharding.Mesh over 8 host-platform devices).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# XLA compiles in this environment are slow (~0.4s per executable); the
# persistent cache makes repeated test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

# The axon TPU plugin force-appends itself to jax_platforms regardless of the
# env var; override it so tests run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devices = jax.devices()
    assert len(devices) >= 8, f"Expected >=8 virtual CPU devices, got {len(devices)}"
    return devices
