"""Perplexity harness (the <=0.1 ppl-delta north star's measuring stick;
role of reference lm-eval GSM8K + test_quantization_accuracy.py:24-51).

Computes token-level perplexity over a text file (WikiText-2 raw format
works: pass --text wiki.test.raw) or a built-in synthetic corpus when no
file/network is available, via the engine's prompt_logprobs path — the
same fused forward the serving stack uses, so quantization error shows
up exactly as served.

Usage:
  python benchmarks/benchmark_ppl.py --model PATH [--text FILE]
      [--max-chunks N] [--chunk-len 512] [--quantization pq]
  # compare two configs (e.g. PQ vs dense) by running twice.

Prints one JSON line: {"metric": "perplexity", "value": ..., ...}
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_corpus(vocab_size: int, n_tokens: int, seed: int = 0):
    """Markov-chain token stream: structured enough that a model's ppl
    is meaningfully below uniform (for CI smoke runs without data)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    state = 7
    out = []
    for _ in range(n_tokens):
        if rng.random() < 0.7:
            state = (state * 31 + 17) % (vocab_size - 10) + 5
        else:
            state = int(rng.integers(5, vocab_size - 5))
        out.append(state)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--text", default=None,
                    help="raw text file (e.g. wikitext-2 test split)")
    ap.add_argument("--chunk-len", type=int, default=512)
    ap.add_argument("--max-chunks", type=int, default=16)
    ap.add_argument("--quantization", default=None)
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--load-format", default=None)
    args = ap.parse_args()

    from vllm_pq_tpu import LLM, SamplingParams

    kw = dict(model=args.model, max_model_len=args.chunk_len + 8,
              max_num_seqs=4,
              max_num_batched_tokens=max(1024, args.chunk_len + 8),
              enable_prefix_caching=False)
    if args.quantization:
        kw["quantization"] = args.quantization
    if args.dtype:
        kw["dtype"] = args.dtype
    if args.load_format:
        kw["load_format"] = args.load_format
    llm = LLM(**kw)
    tok = llm.get_tokenizer()

    if args.text and os.path.isfile(args.text):
        with open(args.text, "r", errors="replace") as f:
            ids = tok.encode(f.read())
        source = os.path.basename(args.text)
    else:
        vocab = llm.llm_engine.engine_core.runner.model.cfg.vocab_size
        ids = synthetic_corpus(vocab, args.chunk_len * args.max_chunks)
        source = "synthetic"

    chunks = [ids[i:i + args.chunk_len]
              for i in range(0, len(ids) - args.chunk_len + 1,
                             args.chunk_len)][:args.max_chunks]
    sp = SamplingParams(temperature=0.0, max_tokens=1, prompt_logprobs=1,
                        ignore_eos=True)
    total_lp, total_n = 0.0, 0
    for chunk in chunks:
        out = llm.generate([{"prompt_token_ids": chunk}], sp)[0]
        plp = out.prompt_logprobs
        for pos in range(1, len(chunk)):
            entry = plp[pos]
            if entry is None or chunk[pos] not in entry:
                continue
            total_lp += entry[chunk[pos]].logprob
            total_n += 1
    ppl = math.exp(-total_lp / max(total_n, 1))
    print(json.dumps({
        "metric": "perplexity", "value": round(ppl, 4),
        "tokens": total_n, "source": source, "model": args.model,
        "quantization": args.quantization,
    }))


if __name__ == "__main__":
    main()
