"""Platform plugin layer (role of reference ``vllm/platforms/``:
``interface.py`` Platform ABC + ``__init__.py`` resolution with
out-of-tree plugin discovery).

Resolution order for ``current_platform``:
1. ``VPQ_PLATFORM_PLUGIN`` env var: ``"module.path:attr"`` naming a
   Platform instance or zero-arg factory (out-of-tree platforms).
2. Entry points in group ``vllm_pq_tpu.platform_plugins`` (each entry
   loads to a factory returning a Platform or None to pass).
3. Autodetect from the jax backend (tpu -> TpuPlatform, else
   CpuPlatform).
"""

import importlib
import os
from typing import Optional

from vllm_pq_tpu.logger import init_logger
from vllm_pq_tpu.platforms.interface import (CpuPlatform, Platform,
                                             TpuPlatform)

logger = init_logger(__name__)

_current: Optional[Platform] = None


def _load_env_plugin() -> Optional[Platform]:
    spec = os.environ.get("VPQ_PLATFORM_PLUGIN")
    if not spec:
        return None
    mod_name, _, attr = spec.partition(":")
    mod = importlib.import_module(mod_name)
    obj = getattr(mod, attr or "platform")
    plat = obj() if callable(obj) else obj
    if not isinstance(plat, Platform):
        raise TypeError(
            f"VPQ_PLATFORM_PLUGIN {spec!r} resolved to {type(plat)}, "
            "expected a Platform")
    logger.info("platform plugin (env): %s", plat.device_name)
    return plat


def _load_entrypoint_plugins() -> Optional[Platform]:
    try:
        from importlib.metadata import entry_points
        eps = entry_points(group="vllm_pq_tpu.platform_plugins")
    except Exception:
        return None
    for ep in eps:
        try:
            plat = ep.load()()
        except Exception as e:  # pragma: no cover
            logger.warning("platform plugin %s failed: %s", ep.name, e)
            continue
        if plat is not None:
            logger.info("platform plugin (entry point %s): %s", ep.name,
                        plat.device_name)
            return plat
    return None


def _autodetect() -> Platform:
    import jax
    try:
        kind = jax.devices()[0].platform
    except RuntimeError:
        kind = "cpu"
    return TpuPlatform() if kind in ("tpu", "axon") else CpuPlatform()


def current_platform() -> Platform:
    """The resolved Platform singleton."""
    global _current
    if _current is None:
        _current = (_load_env_plugin() or _load_entrypoint_plugins()
                    or _autodetect())
    return _current


def set_current_platform(platform: Optional[Platform]) -> None:
    """Override (tests / embedding applications)."""
    global _current
    _current = platform


__all__ = ["Platform", "TpuPlatform", "CpuPlatform", "current_platform",
           "set_current_platform"]
