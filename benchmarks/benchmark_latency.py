"""Offline batch-latency benchmark (role of reference
``benchmarks/benchmark_latency.py``): fixed input/output lengths, one
batch, reports mean/median/p99 end-to-end step latency.

  python benchmarks/benchmark_latency.py --model <dir> --load-format \
      dummy --input-len 32 --output-len 128 --batch-size 8
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
    parser.add_argument("--input-len", type=int, default=32)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--num-iters", type=int, default=3)
    parser.add_argument("--num-iters-warmup", type=int, default=1)
    parser.add_argument("--output-json", type=str, default=None)
    args = parser.parse_args()

    from vllm_pq_tpu import LLM, SamplingParams
    engine_args = EngineArgs.from_cli_args(args)
    llm = LLM(**engine_args.__dict__)

    rng = np.random.default_rng(0)
    vocab = llm.llm_engine.processor.vocab_size
    prompts = [{"prompt_token_ids":
                rng.integers(10, vocab - 10, args.input_len).tolist()}
               for _ in range(args.batch_size)]
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                        ignore_eos=True)

    def run():
        t0 = time.perf_counter()
        llm.generate(prompts, sp)
        return time.perf_counter() - t0

    for _ in range(args.num_iters_warmup):
        run()
    lat = [run() for _ in range(args.num_iters)]
    result = {
        "avg_latency": float(np.mean(lat)),
        "median_latency": float(np.median(lat)),
        "p99_latency": float(np.percentile(lat, 99)),
        "latencies": lat,
    }
    print(json.dumps(result, indent=2))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
