"""Test config: run everything on CPU with 8 virtual devices so sharding
tests exercise a real (tp, dp) mesh without TPU hardware (analog of the
reference's multi-GPU-free distributed tests, SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax
    return jax.devices("cpu")
