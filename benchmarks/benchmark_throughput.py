"""Offline throughput benchmark (role of reference
``benchmarks/benchmark_throughput.py``): N requests with random or
sampled lengths, dynamic continuous batching, reports requests/s and
tokens/s.

  python benchmarks/benchmark_throughput.py --model <dir> --load-format \
      dummy --num-prompts 200 --input-len 128 --output-len 128
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
    parser.add_argument("--num-prompts", type=int, default=200)
    parser.add_argument("--input-len", type=int, default=128)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--random-lens", action="store_true",
                        help="sample lengths uniformly in [1, len]")
    parser.add_argument("--output-json", type=str, default=None)
    args = parser.parse_args()

    from vllm_pq_tpu import LLM, SamplingParams
    engine_args = EngineArgs.from_cli_args(args)
    llm = LLM(**engine_args.__dict__)

    rng = np.random.default_rng(0)
    vocab = llm.llm_engine.processor.vocab_size
    reqs = []
    for _ in range(args.num_prompts):
        ilen = (int(rng.integers(1, args.input_len + 1))
                if args.random_lens else args.input_len)
        olen = (int(rng.integers(1, args.output_len + 1))
                if args.random_lens else args.output_len)
        reqs.append((
            {"prompt_token_ids":
             rng.integers(10, vocab - 10, ilen).tolist()},
            SamplingParams(temperature=0.0, max_tokens=olen,
                           ignore_eos=True)))

    # warmup compile
    llm.generate([reqs[0][0]], SamplingParams(temperature=0.0,
                                              max_tokens=4,
                                              ignore_eos=True))

    t0 = time.perf_counter()
    outs = llm.generate([r[0] for r in reqs], [r[1] for r in reqs])
    dt = time.perf_counter() - t0
    in_tokens = sum(len(r[0]["prompt_token_ids"]) for r in reqs)
    out_tokens = sum(len(o.outputs[0].token_ids) for o in outs)
    result = {
        "elapsed_s": dt,
        "requests_per_s": len(reqs) / dt,
        "total_tokens_per_s": (in_tokens + out_tokens) / dt,
        "output_tokens_per_s": out_tokens / dt,
    }
    print(json.dumps(result, indent=2))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
