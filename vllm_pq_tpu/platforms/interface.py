"""Platform interface (role of reference ``vllm/platforms/interface.py``
``Platform`` ABC): everything device-specific the engine consults —
memory size, default attention backend, compile-cache policy, config
fixups — behind one object so out-of-tree backends can plug in."""

from typing import Optional

from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)


class Platform:
    """Base platform. Subclass for out-of-tree devices and point
    ``VPQ_PLATFORM_PLUGIN`` at an instance/factory."""

    device_name: str = "base"
    # jax backend names this platform claims
    jax_platforms: tuple = ()
    # whether Pallas kernels lower natively (False -> interpret/XLA)
    supports_pallas: bool = False

    def total_memory_bytes(self) -> int:
        """Per-device memory for the KV-cache sizing probe when the
        runtime doesn't report it."""
        return 4 * 2 ** 30

    def default_attention_backend(self) -> str:
        return "ref"

    def setup_compile_cache(self, path: Optional[str]) -> None:
        """Enable the persistent compilation cache (no-op default)."""

    def check_and_update_config(self, config) -> None:
        """Platform-specific config fixups before engine init."""

    def is_tpu(self) -> bool:
        return False


class TpuPlatform(Platform):
    device_name = "tpu"
    jax_platforms = ("tpu", "axon")
    supports_pallas = True

    def total_memory_bytes(self) -> int:
        return 16 * 2 ** 30  # v5e HBM

    def default_attention_backend(self) -> str:
        return "auto"  # runner picks XLA-gather decode + Pallas prefill

    def setup_compile_cache(self, path: Optional[str]) -> None:
        if not path:
            return
        import os

        import jax
        try:
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception as e:  # pragma: no cover
            logger.warning("compile cache disabled: %s", e)

    def is_tpu(self) -> bool:
        return True


class CpuPlatform(Platform):
    """XLA:CPU fallback backend (role of reference vllm/platforms/cpu):
    the full engine runs, Pallas kernels run in interpret mode or via
    their XLA reference paths."""

    device_name = "cpu"
    jax_platforms = ("cpu",)

    def setup_compile_cache(self, path: Optional[str]) -> None:
        # CPU compiles are fast and the AOT cache can be machine-
        # feature-sensitive; skip.
        return
