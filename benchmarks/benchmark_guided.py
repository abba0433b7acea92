"""Guided-decoding benchmark (role of reference
``benchmarks/benchmark_guided.py``): throughput and per-request latency
of JSON-schema / regex / choice constrained generation vs unguided, at
a configurable guided ratio. Exercises the host-side FSM compilation
(vllm_pq_tpu/guided) and the constrained (bitmask) step variants.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "active": {"type": "boolean"},
    },
    "required": ["name", "age"],
}


def main():
    parser = argparse.ArgumentParser()
    from vllm_pq_tpu.engine.arg_utils import EngineArgs
    EngineArgs.add_cli_args(parser)
    parser.add_argument("--num-prompts", type=int, default=32)
    parser.add_argument("--output-len", type=int, default=64)
    parser.add_argument("--guided-ratio", type=float, default=1.0)
    parser.add_argument("--mode", default="json",
                        choices=("json", "regex", "choice"))
    args = parser.parse_args()

    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.sampling_params import GuidedDecodingParams
    engine_args = EngineArgs.from_cli_args(args)
    llm = LLM(**engine_args.__dict__)

    if args.mode == "json":
        gd = GuidedDecodingParams(json=SCHEMA)
    elif args.mode == "regex":
        gd = GuidedDecodingParams(regex=r"(yes|no), confidence [0-9]+%")
    else:
        gd = GuidedDecodingParams(
            choice=["positive", "negative", "neutral"])

    rng = np.random.default_rng(0)
    vocab = llm.llm_engine.processor.vocab_size
    prompts = [{"prompt_token_ids":
                rng.integers(10, vocab - 10, 24).tolist()}
               for _ in range(args.num_prompts)]
    n_guided = int(round(args.num_prompts * args.guided_ratio))
    params = [SamplingParams(temperature=0.0,
                             max_tokens=args.output_len,
                             guided_decoding=gd if i < n_guided else None,
                             ignore_eos=(i >= n_guided))
              for i in range(args.num_prompts)]

    # warmup (compiles constrained + plain variants)
    llm.generate(prompts[:2], params[:2])

    def run(ps):
        t0 = time.perf_counter()
        outs = llm.generate(prompts, ps)
        dt = time.perf_counter() - t0
        toks = sum(len(o.outputs[0].token_ids) for o in outs)
        return dt, toks, outs

    dt_g, toks_g, outs = run(params)
    plain = [SamplingParams(temperature=0.0, max_tokens=args.output_len,
                            ignore_eos=True)
             for _ in range(args.num_prompts)]
    dt_p, toks_p, _ = run(plain)

    ok = 0
    if args.mode == "json":
        for o in outs[:n_guided]:
            try:
                json.loads(o.outputs[0].text)
                ok += 1
            except Exception:
                pass
    print(json.dumps({
        "mode": args.mode,
        "num_prompts": args.num_prompts,
        "guided_ratio": args.guided_ratio,
        "guided_wall_s": round(dt_g, 3),
        "guided_tok_s": round(toks_g / dt_g, 2),
        "unguided_wall_s": round(dt_p, 3),
        "unguided_tok_s": round(toks_p / dt_p, 2),
        "guided_overhead_x": round(dt_g / dt_p, 3) if dt_p else None,
        "json_valid": (f"{ok}/{n_guided}" if args.mode == "json"
                       else None),
    }, indent=2))


if __name__ == "__main__":
    main()
