"""Worker: device/mesh init, model build + load, KV memory sizing.

Role of the reference's ``v1/worker/tpu_worker.py`` (memory probe
:115-156, compile cache :103-110) and the KV-config derivation
(``v1/core/kv_cache_utils.py:503-553``), for a single-process JAX world:
the mesh spans all local devices; multi-host uses jax.distributed with
the same code (every host runs the identical jitted step).
"""

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

import vllm_pq_tpu.envs as envs
from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.logger import init_logger
from vllm_pq_tpu.utils import cdiv
from vllm_pq_tpu.worker.runner import ModelRunner

logger = init_logger(__name__)

def _setup_compile_cache() -> None:
    from vllm_pq_tpu.platforms import current_platform
    current_platform().setup_compile_cache(envs.VPQ_XLA_CACHE_PATH)


class Worker:

    def __init__(self, config: EngineConfig):
        self.config = config
        _setup_compile_cache()

        tp = config.parallel.tensor_parallel_size
        dp = config.parallel.data_parallel_size
        pp = config.parallel.pipeline_parallel_size
        off = config.parallel.device_offset
        devices = jax.devices()
        need = tp * dp * pp
        if len(devices) < off + need:
            raise ValueError(
                f"need devices [{off}, {off + need}) for tp={tp} dp={dp} "
                f"pp={pp}, have {len(devices)}")
        if pp > 1:
            # pipe axis between data and model: stage hops ride ICI
            # neighbors, TP stays innermost (parallel/pipeline.py)
            dev_array = np.array(devices[off:off + need]).reshape(
                dp, pp, tp)
            self.mesh = Mesh(dev_array, ("data", "pipe", "model"))
        else:
            dev_array = np.array(devices[off:off + need]).reshape(dp, tp)
            self.mesh = Mesh(dev_array, ("data", "model"))
        self.platform = devices[0].platform
        logger.info("mesh: %s on %s", dict(dp=dp, pp=pp, tp=tp),
                    devices[0])

        self.model = None
        self.params = None
        self.runner: Optional[ModelRunner] = None

    # ------------------------------------------------------------------

    def load_model(self) -> None:
        from vllm_pq_tpu.model_loader.loader import load_model_params
        from vllm_pq_tpu.models.registry import build_model
        from vllm_pq_tpu.quantization import get_linear_method

        cfg = self.config
        linear_method = get_linear_method(cfg.model.quantization)
        self.model, self.linear_method = build_model(cfg, linear_method)
        self.params = load_model_params(self.model, self.mesh, cfg,
                                        self.linear_method)
        from vllm_pq_tpu.quantization.resident import maybe_make_resident
        resident = maybe_make_resident(self.model, self.params, self.mesh,
                                       cfg)
        if resident is not None:
            self.params = resident
            self.linear_method = self.model.linear_method
        logger.info("model loaded: %s (%s, quant=%s)", cfg.model.model,
                    type(self.model).__name__, cfg.model.quantization)

    # ------------------------------------------------------------------

    def _device_memory(self) -> Tuple[int, int]:
        """(total_bytes, used_bytes) per device; falls back to defaults."""
        dev = jax.devices()[0]
        try:
            stats = dev.memory_stats()
            if stats and "bytes_limit" in stats:
                return stats["bytes_limit"], stats.get("bytes_in_use", 0)
        except Exception:
            pass
        from vllm_pq_tpu.platforms import current_platform
        total = current_platform().total_memory_bytes()
        used = self._param_bytes() // max(
            self.config.parallel.world_size, 1)
        return total, used

    def _param_bytes(self) -> int:
        total = 0
        for leaf in jax.tree.leaves(self.params):
            total += leaf.size * leaf.dtype.itemsize
        return total

    def determine_num_kv_blocks(self) -> int:
        """KV block budget from the memory probe (reference
        determine_available_memory + num_blocks derivation)."""
        cfg = self.config
        if getattr(self.model, "is_encoder_only", False):
            return 16  # encoder-only models hold no KV cache
        if cfg.cache.num_blocks_override:
            return cfg.cache.num_blocks_override
        total, used = self._device_memory()
        util = cfg.cache.gpu_memory_utilization
        # workspace headroom for activations/compiler scratch
        headroom = min(int(total * 0.08), 1 << 30)
        avail = int(total * util) - used - headroom
        tp = cfg.parallel.tensor_parallel_size
        # derive per-block bytes from the model's own cache layout (MLA
        # latent caches are not MHA-shaped), bf16 = 2 bytes
        one = self.model.kv_cache_shape(1, cfg.cache.block_size,
                                        tp_size=tp)
        if cfg.cache.cache_dtype == "int8" and len(one) == 4:
            # int8 data + f32 per-(token, head) scale
            per_block = (int(np.prod(one[1:]))
                         + int(np.prod(one[1:-1])) * 4)
        else:
            per_block = int(np.prod(one[1:])) * 2
        bytes_per_block = per_block * self.model.cfg.num_hidden_layers
        num = max(avail // bytes_per_block, 16)
        # never allocate more than the scheduler can address
        max_useful = (cdiv(cfg.scheduler.max_model_len,
                           cfg.cache.block_size) *
                      cfg.scheduler.max_num_seqs + 1)
        num = int(min(num, max_useful * 2))
        max_concurrency = (num * cfg.cache.block_size /
                           cfg.scheduler.max_model_len)
        logger.info(
            "KV cache: %d blocks of %d tokens (%.1f GiB/device); max "
            "concurrency at max_model_len: %.1fx", num,
            cfg.cache.block_size,
            num * bytes_per_block / tp / 2**30, max_concurrency)
        return num

    def init_runner(self, num_kv_blocks: int):
        if getattr(self.model, "is_encoder_only", False):
            from vllm_pq_tpu.worker.encoder_runner import EncoderRunner
            self.runner = EncoderRunner(self.config, self.mesh,
                                        self.model, self.params)
            return self.runner
        self.runner = ModelRunner(self.config, self.mesh, self.model,
                                  self.params, num_kv_blocks)
        return self.runner
