"""Platform plugin layer (role of reference vllm/platforms/: Platform
ABC, resolution order, out-of-tree plugin hook)."""

import os

from vllm_pq_tpu.platforms import (CpuPlatform, Platform, TpuPlatform,
                                   current_platform,
                                   set_current_platform)


class _FakePlatform(Platform):
    device_name = "fake-npu"
    supports_pallas = False

    def total_memory_bytes(self):
        return 123 * 2 ** 20


def fake_factory():
    return _FakePlatform()


def test_autodetect_cpu():
    set_current_platform(None)
    os.environ.pop("VPQ_PLATFORM_PLUGIN", None)
    plat = current_platform()
    # tests force JAX_PLATFORMS=cpu (conftest)
    assert isinstance(plat, CpuPlatform)
    assert not plat.is_tpu()


def test_env_plugin_resolution():
    set_current_platform(None)
    os.environ["VPQ_PLATFORM_PLUGIN"] = \
        "tests.test_platforms:fake_factory"
    try:
        plat = current_platform()
        assert plat.device_name == "fake-npu"
        assert plat.total_memory_bytes() == 123 * 2 ** 20
    finally:
        os.environ.pop("VPQ_PLATFORM_PLUGIN", None)
        set_current_platform(None)


def test_env_plugin_instance_attr():
    set_current_platform(None)
    os.environ["VPQ_PLATFORM_PLUGIN"] = \
        "tests.test_platforms:_FakePlatform"
    try:
        assert current_platform().device_name == "fake-npu"
    finally:
        os.environ.pop("VPQ_PLATFORM_PLUGIN", None)
        set_current_platform(None)


def test_device_config_uses_platform():
    from vllm_pq_tpu.config import DeviceConfig
    set_current_platform(TpuPlatform())
    try:
        assert DeviceConfig(device="auto").resolve() == "tpu"
    finally:
        set_current_platform(None)
    assert DeviceConfig(device="cpu").resolve() == "cpu"


def test_tpu_platform_defaults():
    plat = TpuPlatform()
    assert plat.is_tpu() and plat.supports_pallas
    assert plat.total_memory_bytes() == 16 * 2 ** 30
