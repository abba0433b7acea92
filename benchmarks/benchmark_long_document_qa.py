"""Long-document QA throughput benchmark (role of reference
``benchmarks/benchmark_long_document_qa_throughput.py``): N long
documents, each queried ``--repeat-count`` times in a chosen order;
prefix caching turns repeats into cache hits, so the repeat ORDER
(interleave > random > tile) controls the hit rate. Reports wall time,
output tok/s and the measured prefix-cache hit rate.
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
    parser.add_argument("--num-documents", type=int, default=8)
    parser.add_argument("--document-length", type=int, default=2000)
    parser.add_argument("--output-len", type=int, default=10)
    parser.add_argument("--repeat-count", type=int, default=2)
    parser.add_argument("--repeat-mode", default="random",
                        choices=("random", "tile", "interleave"))
    parser.add_argument("--shuffle-seed", type=int, default=0)
    args = parser.parse_args()

    from vllm_pq_tpu import LLM, SamplingParams
    engine_args = EngineArgs.from_cli_args(args)
    llm = LLM(**engine_args.__dict__)

    rng = np.random.default_rng(1)
    vocab = llm.llm_engine.processor.vocab_size
    docs = [rng.integers(10, vocab - 10,
                         args.document_length).tolist()
            for _ in range(args.num_documents)]
    # a short per-repeat "question" suffix so repeats are not byte-equal
    def q(i):
        return rng.integers(10, vocab - 10, 8).tolist()

    if args.repeat_mode == "tile":
        order = list(range(args.num_documents)) * args.repeat_count
    elif args.repeat_mode == "interleave":
        order = [i for i in range(args.num_documents)
                 for _ in range(args.repeat_count)]
    else:
        order = list(range(args.num_documents)) * args.repeat_count
        np.random.default_rng(args.shuffle_seed).shuffle(order)

    prompts = [{"prompt_token_ids": docs[i] + q(n)}
               for n, i in enumerate(order)]
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                        ignore_eos=True)

    # warmup: compile prefill buckets on one short request
    llm.generate([{"prompt_token_ids": docs[0][:64]}],
                 SamplingParams(temperature=0.0, max_tokens=2,
                                ignore_eos=True))

    t0 = time.perf_counter()
    outs = llm.generate(prompts, sp)
    dt = time.perf_counter() - t0
    out_toks = sum(len(o.outputs[0].token_ids) for o in outs)
    in_toks = sum(len(p["prompt_token_ids"]) for p in prompts)

    stats = llm.llm_engine.engine_core.make_stats()
    qn = stats.get("prefix_cache_queries", 0)
    h = stats.get("prefix_cache_hits", 0)
    print(json.dumps({
        "num_requests": len(prompts),
        "input_tokens": in_toks,
        "output_tokens": out_toks,
        "wall_s": round(dt, 3),
        "output_tok_s": round(out_toks / dt, 2),
        "total_tok_s": round((in_toks + out_toks) / dt, 2),
        "prefix_cache_hit_rate": round(h / qn, 4) if qn else 0.0,
        "repeat_mode": args.repeat_mode,
    }, indent=2))


if __name__ == "__main__":
    main()
