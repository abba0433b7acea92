"""EngineArgs: flat kwargs/CLI flags -> EngineConfig (role of reference
``engine/arg_utils.py:91``)."""

import argparse
from dataclasses import dataclass, field, fields
from typing import Any, Dict, Optional

from vllm_pq_tpu.config import (CacheConfig, CompilationConfig, DeviceConfig,
                                EngineConfig, KVTransferConfig, LoRAConfig,
                                ModelConfig, ObservabilityConfig,
                                ParallelConfig, SchedulerConfig,
                                SpeculativeConfig)


@dataclass
class EngineArgs:
    model: str = "facebook/opt-125m"
    tokenizer: Optional[str] = None
    dtype: str = "bfloat16"
    seed: int = 0
    max_model_len: int = 2048
    quantization: Optional[str] = None
    load_format: str = "auto"
    trust_remote_code: bool = False
    revision: Optional[str] = None
    hf_overrides: Dict[str, Any] = field(default_factory=dict)

    block_size: int = 16
    # KV cache dtype: "auto" (model dtype) or "int8" (+per-head scales,
    # role of reference --kv-cache-dtype fp8)
    kv_cache_dtype: str = "auto"
    gpu_memory_utilization: float = 0.9
    num_kv_blocks: Optional[int] = None
    enable_prefix_caching: bool = True

    tensor_parallel_size: int = 1
    distributed_executor_backend: str = "uniproc"
    data_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    enable_expert_parallel: bool = False
    # run the EngineCore loop in a background process (ZMQ)
    enable_engine_multiprocessing: bool = False

    max_num_seqs: int = 64
    max_num_batched_tokens: int = 1024
    num_scheduler_steps: int = 1
    async_scheduling: bool = False
    enable_warmup: bool = False
    device: str = "auto"
    disable_log_stats: bool = False

    # multi-LoRA serving
    enable_lora: bool = False
    max_loras: int = 4
    max_lora_rank: int = 16

    # disaggregated prefill (KV transfer)
    kv_role: Optional[str] = None
    kv_endpoint: str = "tcp://127.0.0.1:5601"

    # speculative decoding (ngram prompt-lookup)
    speculative_method: Optional[str] = None
    speculative_model: Optional[str] = None
    num_speculative_tokens: int = 0
    prompt_lookup_min: int = 2
    prompt_lookup_max: int = 4
    spec_decoding_acceptance_method: str = "rejection_sampler"
    typical_acceptance_sampler_posterior_threshold: float = 0.09
    typical_acceptance_sampler_posterior_alpha: float = 0.3

    def create_engine_config(self) -> EngineConfig:
        return EngineConfig(
            model=ModelConfig(
                model=self.model, tokenizer=self.tokenizer,
                dtype=self.dtype, seed=self.seed,
                max_model_len=self.max_model_len,
                quantization=self.quantization,
                load_format=self.load_format,
                trust_remote_code=self.trust_remote_code,
                revision=self.revision, hf_overrides=self.hf_overrides),
            cache=CacheConfig(
                block_size=self.block_size,
                gpu_memory_utilization=self.gpu_memory_utilization,
                num_blocks_override=self.num_kv_blocks,
                enable_prefix_caching=self.enable_prefix_caching,
                cache_dtype=self.kv_cache_dtype),
            parallel=ParallelConfig(
                tensor_parallel_size=self.tensor_parallel_size,
                distributed_executor_backend=(
                    self.distributed_executor_backend),
                data_parallel_size=self.data_parallel_size,
                pipeline_parallel_size=self.pipeline_parallel_size,
                enable_expert_parallel=self.enable_expert_parallel,
                engine_multiprocessing=self.enable_engine_multiprocessing),
            scheduler=SchedulerConfig(
                max_num_seqs=self.max_num_seqs,
                max_num_batched_tokens=self.max_num_batched_tokens,
                max_model_len=self.max_model_len,
                num_scheduler_steps=self.num_scheduler_steps,
                async_scheduling=self.async_scheduling),
            compilation=CompilationConfig(warmup=self.enable_warmup),
            device=DeviceConfig(device=self.device),
            observability=ObservabilityConfig(
                collect_metrics=not self.disable_log_stats),
            lora=LoRAConfig(
                enable_lora=self.enable_lora,
                max_loras=self.max_loras,
                max_lora_rank=self.max_lora_rank),
            kv_transfer=KVTransferConfig(
                kv_role=self.kv_role, kv_endpoint=self.kv_endpoint),
            speculative=SpeculativeConfig(
                method=self.speculative_method,
                model=self.speculative_model,
                num_spec_tokens=self.num_speculative_tokens,
                prompt_lookup_min=self.prompt_lookup_min,
                prompt_lookup_max=self.prompt_lookup_max),
        )

    # explicit types for Optional[...] fields (defaults of None carry no
    # type information for argparse)
    _OPTIONAL_TYPES = {"num_kv_blocks": int, "tokenizer": str,
                       "quantization": str, "revision": str,
                       "speculative_method": str,
                       "speculative_model": str, "kv_role": str}

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser
                     ) -> argparse.ArgumentParser:
        for f in fields(EngineArgs):
            name = "--" + f.name.replace("_", "-")
            if f.type == bool or isinstance(f.default, bool):
                parser.add_argument(
                    name, action="store_true" if not f.default
                    else "store_false", default=f.default)
            elif f.name == "hf_overrides":
                continue
            else:
                typ = EngineArgs._OPTIONAL_TYPES.get(f.name) or (
                    int if isinstance(f.default, int)
                    and not isinstance(f.default, bool)
                    else float if isinstance(f.default, float)
                    else str)
                parser.add_argument(name, type=typ, default=f.default)
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        names = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in vars(args).items() if k in names})
