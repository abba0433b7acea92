"""Test config: run everything on CPU with 8 virtual devices so sharding
tests exercise a real (tp, dp) mesh without TPU hardware (analog of the
reference's multi-GPU-free distributed tests, SURVEY.md §4)."""

import os
import sys

# Force CPU: the ambient environment may point JAX at a tunneled TPU
# (JAX_PLATFORMS=axon via the axon plugin on PYTHONPATH); unit tests must
# never dispatch through it. Strip the plugin before jax is imported.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if ".axon_site" not in p)

# The plugin's sitecustomize may have already run register() at
# interpreter start (it sets jax_platforms programmatically, which
# overrides the env var). Undo it before any backend initializes.
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax
    return jax.devices("cpu")
