"""Typed, lazily-read environment variables.

Mirrors the pattern (not the code) of the reference's ``vllm/envs.py``: one
module of ``VPQ_*`` env vars, each a lazy lambda so values are read at use
time and can be monkeypatched in tests.
"""

import os
from typing import Any, Callable, Dict

environment_variables: Dict[str, Callable[[], Any]] = {
    # Logging level for the framework logger.
    "VPQ_LOGGING_LEVEL": lambda: os.environ.get("VPQ_LOGGING_LEVEL", "INFO"),
    # Persistent XLA compile cache directory (role of VLLM_XLA_CACHE_PATH,
    # reference vllm/envs.py:438).
    "VPQ_XLA_CACHE_PATH": lambda: os.environ.get(
        "VPQ_XLA_CACHE_PATH", os.path.expanduser("~/.cache/vllm_pq_tpu/xla")
    ),
    # Force a jax platform ("cpu" / "tpu"); empty = jax default.
    "VPQ_PLATFORM": lambda: os.environ.get("VPQ_PLATFORM", ""),
    # Attention backend override: "pallas" | "xla" | "ref".
    "VPQ_ATTENTION_BACKEND": lambda: os.environ.get("VPQ_ATTENTION_BACKEND", ""),
    # PQ matmul implementation override: "pallas" | "xla".
    "VPQ_PQ_BACKEND": lambda: os.environ.get("VPQ_PQ_BACKEND", ""),
    # Run engine core in a background process (like VLLM_ENABLE_V1_MULTIPROCESSING).
    "VPQ_ENABLE_MULTIPROCESSING": lambda: os.environ.get(
        "VPQ_ENABLE_MULTIPROCESSING", "0") == "1",
    # ZMQ ports / addresses for the engine-core process.
    "VPQ_ENGINE_CORE_ADDR": lambda: os.environ.get(
        "VPQ_ENGINE_CORE_ADDR", "ipc:///tmp/vpq_engine_core"),
    # Profiling output directory; empty disables the profiler endpoints.
    "VPQ_PROFILE_DIR": lambda: os.environ.get("VPQ_PROFILE_DIR", ""),
    # Rich progress / debug timing in the engine loop.
    "VPQ_DEBUG_TIMING": lambda: os.environ.get("VPQ_DEBUG_TIMING", "0") == "1",
    # Disable latent-cache (absorbed) MLA for DeepSeek models; use the
    # decompressed per-head K/V path (role of reference VLLM_MLA_DISABLE).
    "VPQ_MLA_DISABLE": lambda: os.environ.get("VPQ_MLA_DISABLE", "0") == "1",
    # Sliding-window KV reclamation (uniform-window models): free blocks
    # wholly behind the window so long requests hold O(window) blocks.
    "VPQ_SLIDING_RECLAIM": lambda: os.environ.get(
        "VPQ_SLIDING_RECLAIM", "1") == "1",
    # PQ Pallas gather variant (ops/pq_matmul.py): "packed" (one int32
    # gather per codebook/position, bf16 entry pairs) or "split" (two
    # f32 gathers + select, the round-2 kernel, kept for A/B).
    "VPQ_PQ_GATHER": lambda: os.environ.get("VPQ_PQ_GATHER", "packed"),
    # Unknown-architecture fallback (reference models/transformers.py
    # TransformersModel role): run unregistered decoder-only archs
    # through the generic llama-architecture builder driven by config
    # fields. "1" on (default), "0" strict — unknown archs raise.
    "VPQ_TRANSFORMERS_FALLBACK": lambda: os.environ.get(
        "VPQ_TRANSFORMERS_FALLBACK", "1") == "1",
    # Resident PQ form picked once after load (quantization/resident.py):
    # "auto" (dense when it fits the budget, else int8, else stay PQ),
    # "dense"/"bf16" force, "int8" force, "0" off. Resident dense makes
    # both prefill and decode run plain matmuls; int8 halves the bytes
    # streamed per step (the form that fits Llama-2-7B on one v5e chip).
    "VPQ_PQ_RESIDENT": lambda: os.environ.get("VPQ_PQ_RESIDENT", "auto"),
    # Per-device budget (GiB) for the resident weights.
    "VPQ_PQ_RESIDENT_MAX_GB": lambda: float(os.environ.get(
        "VPQ_PQ_RESIDENT_MAX_GB", "8")),
    # Multi-step window dequant: "auto" (on when dense weights fit the
    # budget), "1" (force on), "0" (off). PQ codes are dequantized to
    # dense bf16 ONCE per N-step decode window (fused per-step dequant
    # is VPU-gather-bound on TPU; dense matmuls run at the HBM roofline).
    "VPQ_WINDOW_DEQUANT": lambda: os.environ.get(
        "VPQ_WINDOW_DEQUANT", "auto"),
    # Budget (GiB) for the dense window-dequant weights.
    "VPQ_WINDOW_DEQUANT_MAX_GB": lambda: float(os.environ.get(
        "VPQ_WINDOW_DEQUANT_MAX_GB", "6")),
    # Decode-window dense KV arena (ops/window_attention.py): "auto"
    # (on when it fits the budget), "1" force, "0" off.
    "VPQ_WINDOW_ARENA": lambda: os.environ.get("VPQ_WINDOW_ARENA",
                                               "auto"),
    "VPQ_WINDOW_ARENA_MAX_GB": lambda: float(os.environ.get(
        "VPQ_WINDOW_ARENA_MAX_GB", "6")),
    # Pallas flash arena-attention kernel (ops/arena_kernel.py): "auto"
    # (on on TPU for supported shapes), "1" force (interpret off-TPU,
    # tests), "0" off (XLA einsum fallback, round-3 behavior).
    "VPQ_ARENA_KERNEL": lambda: os.environ.get("VPQ_ARENA_KERNEL",
                                               "auto"),
    # Pallas w8a16 int8-weight matmul (ops/int8_matmul.py): "auto" (on
    # on TPU), "1" force (interpret off-TPU, tests), "0" XLA astype+dot.
    "VPQ_INT8_MM": lambda: os.environ.get("VPQ_INT8_MM", "auto"),
    # int8-resident apply form: "w8a8" (dynamic per-token int8
    # activations, MXU s8xs8 — fastest measured) or "w8a16"
    # (weight-only dequant, no activation quantization error).
    "VPQ_INT8_APPLY": lambda: os.environ.get("VPQ_INT8_APPLY", "w8a8"),
    # fused Pallas activation quantization for w8a8
    # (ops/act_quant.py): "auto" (on on TPU), "1" force (interpret
    # off-TPU, tests), "0" XLA absmax+clamp chain.
    "VPQ_ACT_QUANT": lambda: os.environ.get("VPQ_ACT_QUANT", "auto"),
    # pin page-table buckets to max_model_len: ONE compiled variant per
    # step kind instead of one per pow-2 context bucket. Slightly more
    # gather work on short contexts; removes mid-run compile stalls
    # (each window variant costs minutes through the remote compiler).
    "VPQ_PAGES_FIXED": lambda: os.environ.get(
        "VPQ_PAGES_FIXED", "0") not in ("0", "false", ""),
}


def __getattr__(name: str) -> Any:
    if name in environment_variables:
        return environment_variables[name]()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return list(environment_variables.keys())
