"""Configuration dataclasses.

Plays the role of the reference's ``vllm/config.py`` (ModelConfig /
CacheConfig / ParallelConfig / SchedulerConfig composed into VllmConfig,
reference ``vllm/config.py:106,1049,1326,1527``) but restructured for a
TPU-native engine: static-shape bucketing knobs and mesh axes are
first-class, and there is a single engine generation (V1-style).
"""

import hashlib
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from vllm_pq_tpu.logger import init_logger
from vllm_pq_tpu.utils import cdiv

logger = init_logger(__name__)

_STR_DTYPE = {"bfloat16", "float32", "float16"}


@dataclass
class ModelConfig:
    """The model to serve and how to interpret its checkpoint."""

    model: str = "facebook/opt-125m"
    tokenizer: Optional[str] = None
    dtype: str = "bfloat16"
    seed: int = 0
    max_model_len: Optional[int] = None
    # Quantization method name registered in vllm_pq_tpu.quantization
    # ("pq", "int8", or None for unquantized bf16).
    quantization: Optional[str] = None
    # Load format: "auto" (HF safetensors) or "dummy" (random weights,
    # role of reference --load-format dummy, model_loader/loader.py:440).
    load_format: str = "auto"
    trust_remote_code: bool = False
    revision: Optional[str] = None
    hf_overrides: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        if self.tokenizer is None:
            self.tokenizer = self.model
        if self.dtype not in _STR_DTYPE:
            raise ValueError(f"Unsupported dtype {self.dtype!r}")

    @property
    def jax_dtype(self):
        import jax.numpy as jnp
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                "float16": jnp.float16}[self.dtype]


@dataclass
class CacheConfig:
    """Paged KV-cache configuration.

    ``block_size`` is the page size in tokens. ``num_blocks`` is derived
    from the device memory probe (role of reference
    ``v1/core/kv_cache_utils.py:503-553``) unless overridden.
    """

    block_size: int = 16
    gpu_memory_utilization: float = 0.9
    swap_space_gb: float = 0.0  # no swap: recompute preemption only
    num_blocks_override: Optional[int] = None
    enable_prefix_caching: bool = True
    # dtype of the KV cache ("auto" = model dtype).
    cache_dtype: str = "auto"

    def __post_init__(self):
        if self.block_size & (self.block_size - 1):
            raise ValueError("block_size must be a power of two")


@dataclass
class ParallelConfig:
    """Mesh layout. TP within a host rides ICI; DP may span hosts (DCN).

    Axis names follow the scaling-book convention: mesh ("data", "model").
    """

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # Pipeline parallelism is expressed as stage sharding over the same
    # mesh; >1 enables layer-range partitioning.
    pipeline_parallel_size: int = 1
    # Expert parallelism for MoE layers: partition whole experts over
    # the model axis instead of slicing the intermediate dim (reference
    # --enable-expert-parallel, fused_moe/layer.py:253-290).
    enable_expert_parallel: bool = False
    # Run the EngineCore busy loop in a background process over ZMQ
    # (reference VLLM_ENABLE_V1_MULTIPROCESSING / EngineCoreProc) so
    # frontend work never stalls device dispatch.
    engine_multiprocessing: bool = False
    # Executor seam (reference --distributed-executor-backend):
    # "uniproc" (default) or "external:module.path:ClassName"
    distributed_executor_backend: str = "uniproc"
    # First device index for this engine's mesh (used by the DP router
    # to pin replicas onto disjoint device slices).
    device_offset: int = 0

    @property
    def world_size(self) -> int:
        return (self.tensor_parallel_size * self.data_parallel_size *
                self.pipeline_parallel_size)


@dataclass
class SchedulerConfig:
    """Token-budget continuous-batching scheduler config (V1-style:
    single queue, no prefill/decode distinction, reference
    ``v1/core/scheduler.py:101-110``)."""

    max_num_seqs: int = 64
    max_num_batched_tokens: int = 1024
    max_model_len: int = 2048
    # Lookahead blocks preallocated per running request to reduce
    # per-step allocator traffic (reference kv_cache_manager.py:211-218).
    num_preallocate_blocks: int = 4
    # Enable chunked prefill (inherent in the token-budget scheduler; this
    # only gates whether a single prompt may exceed the budget).
    chunked_prefill: bool = True
    # Multi-step decoding: when every running request is in steady decode
    # (and nothing is waiting), schedule N tokens per request and run N
    # forward+sample iterations in ONE device dispatch (lax.scan). This
    # amortizes per-step dispatch/transfer latency — the reason the
    # reference TPU backend caches multi-step outputs
    # (worker/tpu_model_runner.py:603-632) and V0 has
    # --num-scheduler-steps. 1 disables.
    num_scheduler_steps: int = 1
    # Async scheduling: dispatch step i+1 before fetching step i's
    # sampled tokens (placeholder accounting + on-device prev-token
    # routing). Hides dispatch/transfer latency without multi-step's
    # output burstiness; stop checks lag one step.
    async_scheduling: bool = False
    # Budget (in encoder tokens) for vision-encoder outputs held on the
    # worker (reference EncoderCacheManager / --max-num-encoder-input-
    # tokens analog).
    encoder_cache_size: int = 8192

    def __post_init__(self):
        if self.max_num_batched_tokens < self.max_num_seqs:
            # every running request needs at least one token slot
            self.max_num_batched_tokens = self.max_num_seqs


@dataclass
class SpeculativeConfig:
    """Speculative decoding (role of reference SpeculativeConfig,
    ``vllm/config.py:1781``; V1 scope = ngram prompt-lookup proposer +
    on-device verification, ``v1/spec_decode/ngram_proposer.py`` and
    ``v1/sample/rejection_sampler.py``)."""

    # Proposer: None disables spec decode; "ngram" = prompt-lookup;
    # "draft_model" = a small causal LM proposes K tokens per step
    # (role of reference draft-model spec decode,
    # spec_decode/multi_step_worker.py + top1_proposer.py:44).
    method: Optional[str] = None
    num_spec_tokens: int = 0
    # draft-model checkpoint directory (method="draft_model")
    model: Optional[str] = None
    # ngram window: match the last n in [min, max] tokens against history.
    prompt_lookup_min: int = 2
    prompt_lookup_max: int = 4
    # verification for sampled rows: "rejection_sampler" preserves the
    # target distribution exactly; "typical_acceptance_sampler" accepts
    # by posterior-probability threshold for higher acceptance at the
    # cost of a small, bounded distribution shift (role of reference
    # layers/typical_acceptance_sampler.py)
    acceptance_method: str = "rejection_sampler"
    posterior_threshold: float = 0.09
    posterior_alpha: float = 0.3

    def __post_init__(self):
        if self.method is not None and self.method not in (
                "ngram", "draft_model", "medusa", "mlp_speculator",
                "eagle", "deepseek_mtp"):
            raise ValueError(f"Unknown speculative method {self.method!r}")
        if self.method in ("draft_model", "medusa",
                           "mlp_speculator", "eagle",
                           "deepseek_mtp") and not self.model:
            raise ValueError(f"speculative method {self.method!r} requires "
                             "a checkpoint path (speculative_model)")
        if self.method and self.num_spec_tokens <= 0:
            self.num_spec_tokens = 3
        if self.prompt_lookup_min > self.prompt_lookup_max:
            raise ValueError("prompt_lookup_min > prompt_lookup_max")
        if self.acceptance_method not in (
                "rejection_sampler", "typical_acceptance_sampler"):
            raise ValueError(
                f"Unknown acceptance_method {self.acceptance_method!r}")

    @property
    def enabled(self) -> bool:
        return self.method is not None and self.num_spec_tokens > 0


@dataclass
class LoRAConfig:
    """Multi-LoRA serving (role of reference LoRAConfig,
    ``config.py:2255``). Adapters are stacked on device; the per-token
    slot index rides the packed transfer (see ``vllm_pq_tpu/lora``)."""

    enable_lora: bool = False
    max_loras: int = 4          # live adapter slots (excl. the 0 slot)
    max_lora_rank: int = 16

    def __post_init__(self):
        if self.enable_lora and self.max_loras < 1:
            raise ValueError("max_loras must be >= 1")


@dataclass
class KVTransferConfig:
    """Disaggregated prefill (role of reference KVTransferConfig,
    ``config.py:2790`` + ``distributed/kv_transfer/``): a prefill
    instance (kv_producer) ships computed KV pages to a decode instance
    (kv_consumer) which injects them into its prefix cache."""

    # None disables; "kv_producer" sends finished-prefill KV,
    # "kv_consumer" receives and injects.
    kv_role: Optional[str] = None
    # ZMQ endpoint: consumer binds (PULL), producer connects (PUSH).
    kv_endpoint: str = "tcp://127.0.0.1:5601"
    # consumer staging-buffer cap before FIFO eviction
    kv_buffer_bytes: int = 4 << 30

    def __post_init__(self):
        if self.kv_role not in (None, "kv_producer", "kv_consumer"):
            raise ValueError(f"Unknown kv_role {self.kv_role!r}")


@dataclass
class DeviceConfig:
    """Which jax platform to run on. "auto" picks tpu when present."""

    device: str = "auto"

    def resolve(self) -> str:
        if self.device != "auto":
            return self.device
        # defer to the platform plugin layer (vllm_pq_tpu/platforms/),
        # the role of reference vllm/platforms/__init__.py resolution
        from vllm_pq_tpu.platforms import current_platform
        plat = current_platform()
        return "tpu" if plat.is_tpu() else plat.device_name


@dataclass
class ObservabilityConfig:
    collect_metrics: bool = True
    log_stats_interval_s: float = 10.0
    otlp_traces_endpoint: Optional[str] = None


@dataclass
class CompilationConfig:
    """Static-shape discipline: token-count buckets replace CUDA graphs
    (reference analog: V0-TPU pow-2 buckets, worker/tpu_model_runner.py:862,
    V1-TPU pad-to-16, v1/worker/tpu_model_runner.py:419)."""

    # Token buckets: padded total-token counts the step fn is compiled for.
    # None = derived from scheduler config at engine init.
    token_buckets: Optional[List[int]] = None
    # Pad the request-count axis to this set of buckets.
    seq_buckets: Optional[List[int]] = None
    enable_xla_cache: bool = True
    # Compile every (bucket, decode-variant) step function at startup so
    # serving never hits a multi-second compile mid-request (reference
    # V0-TPU warmup_model). Off by default: offline runs amortize
    # compiles naturally.
    warmup: bool = False

    def derive(self, scheduler: SchedulerConfig) -> None:
        if self.token_buckets is None:
            buckets, b = [], 16
            while b < scheduler.max_num_batched_tokens:
                buckets.append(b)
                b *= 2
            buckets.append(scheduler.max_num_batched_tokens)
            self.token_buckets = buckets
        if self.seq_buckets is None:
            buckets, b = [], 8
            while b < scheduler.max_num_seqs:
                buckets.append(b)
                b *= 2
            buckets.append(scheduler.max_num_seqs)
            self.seq_buckets = buckets


@dataclass
class EngineConfig:
    """Composite of all configs (role of reference VllmConfig)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    device: DeviceConfig = field(default_factory=DeviceConfig)
    observability: ObservabilityConfig = field(
        default_factory=ObservabilityConfig)
    compilation: CompilationConfig = field(default_factory=CompilationConfig)
    speculative: SpeculativeConfig = field(default_factory=SpeculativeConfig)
    lora: LoRAConfig = field(default_factory=LoRAConfig)
    kv_transfer: KVTransferConfig = field(default_factory=KVTransferConfig)

    def __post_init__(self):
        self.compilation.derive(self.scheduler)
        if (self.speculative.enabled
                and self.scheduler.num_scheduler_steps > 1):
            if self.speculative.method in ("medusa", "mlp_speculator"):
                # in-graph proposers compose with decode windows: the
                # window body drafts, verifies, and advances 1..k+1
                # positions per iteration (worker/runner.py spec_loop).
                # The window's emitted count is data-dependent, so the
                # host cannot pack the NEXT window without the previous
                # result — lag-1 async does not compose here.
                if self.scheduler.async_scheduling:
                    logger.warning(
                        "speculative multi-step windows are exclusive "
                        "with async scheduling; disabling async")
                    self.scheduler.async_scheduling = False
            else:
                logger.warning(
                    "host-proposer speculative decoding and multi-step "
                    "decoding are mutually exclusive; disabling "
                    "multi-step")
                self.scheduler.num_scheduler_steps = 1
        if (self.scheduler.async_scheduling and self.speculative.enabled
                and self.speculative.method not in ("medusa",
                                                    "mlp_speculator")):
            # in-graph proposers compose with the lag-1 pipeline
            # (device-resolved sentinel drafts, engine/core.py); host
            # proposers need same-step tokens
            logger.warning("async scheduling is exclusive with "
                           "host-proposer speculative decoding "
                           "(%s); disabling async",
                           self.speculative.method)
            self.scheduler.async_scheduling = False

    @property
    def max_blocks_per_req(self) -> int:
        return cdiv(self.scheduler.max_model_len, self.cache.block_size)

    def compute_hash(self) -> str:
        """Stable hash over configs for the XLA compile cache key."""
        h = hashlib.sha256(repr(self).encode()).hexdigest()[:16]
        return h
