"""Prefix-caching benchmark (role of reference
``benchmarks/benchmark_prefix_caching.py``): N requests sharing a long
common prefix, run twice (cold, warm); reports speedup and measured
prefix-cache hit rate.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    from vllm_pq_tpu.engine.arg_utils import EngineArgs
    EngineArgs.add_cli_args(parser)
    parser.add_argument("--num-prompts", type=int, default=16)
    parser.add_argument("--prefix-len", type=int, default=256)
    parser.add_argument("--suffix-len", type=int, default=16)
    parser.add_argument("--output-len", type=int, default=32)
    args = parser.parse_args()

    from vllm_pq_tpu import LLM, SamplingParams
    engine_args = EngineArgs.from_cli_args(args)
    engine_args.enable_prefix_caching = True
    llm = LLM(**engine_args.__dict__)

    rng = np.random.default_rng(0)
    vocab = llm.llm_engine.processor.vocab_size
    prefix = rng.integers(10, vocab - 10, args.prefix_len).tolist()
    prompts = [{"prompt_token_ids":
                prefix + rng.integers(10, vocab - 10,
                                      args.suffix_len).tolist()}
               for _ in range(args.num_prompts)]
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                        ignore_eos=True)

    t0 = time.perf_counter()
    llm.generate(prompts, sp)
    cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    llm.generate(prompts, sp)
    warm = time.perf_counter() - t0

    stats = llm.llm_engine.engine_core.make_stats()
    q = stats.get("prefix_cache_queries", 0)
    h = stats.get("prefix_cache_hits", 0)
    print(json.dumps({
        "cold_s": cold,
        "warm_s": warm,
        "speedup": cold / warm if warm else None,
        "prefix_cache_hit_rate": h / q if q else 0.0,
    }, indent=2))


if __name__ == "__main__":
    main()
