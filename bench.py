"""Headline benchmark: PQ decode throughput per chip.

Runs the REAL engine (continuous batching, paged KV, PQ Pallas matmuls,
ragged-paged-attention kernel, on-device sampling) on the flagship
TinyLlama-1.1B-shaped PQ model with dummy weights (throughput does not
depend on weight values; this image has no network for checkpoints).

Prints ONE JSON line:
  {"metric": "decode_tok_s_per_chip", "value": N, "unit": "tok/s",
   "vs_baseline": N / roofline}
where roofline is the weight+KV HBM-streaming bound for the measured
batch/context on v5e (819 GB/s), i.e. vs_baseline == 1.0 means
memory-bandwidth speed-of-light (BASELINE.md north-star: >= 0.9 x the
weight-only roofline).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import numpy as np

    from vllm_pq_tpu import LLM, SamplingParams

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    # flagship config #2 (BASELINE.md): TinyLlama-1.1B PQ, 1 chip
    model_cfg = {
        "architectures": ["LlamaForCausalLM"],
        "vocab_size": 32000, "hidden_size": 2048,
        "intermediate_size": 5632, "num_hidden_layers": 22,
        "num_attention_heads": 32, "num_key_value_heads": 4,
        "rms_norm_eps": 1e-5, "max_position_embeddings": 2048,
    }
    if not on_tpu:  # CPU smoke fallback: tiny model
        model_cfg.update(hidden_size=256, intermediate_size=512,
                         num_hidden_layers=2, num_attention_heads=8,
                         num_key_value_heads=4, vocab_size=2048)

    import tempfile
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(model_cfg, f)

    # Large batch amortizes per-step dispatch/transfer latency (the
    # dominant cost on tunneled TPUs); decode throughput is the metric.
    batch = 256 if on_tpu else 8
    prompt_len = 32
    # 193 decode tokens = the prefill-step sample + 8 multi-step
    # windows of 24; 4 windows warm (covers compiles + the ctx-bucket
    # transition), 3 timed
    decode_steps = 193 if on_tpu else 16

    llm = LLM(model=d, load_format="dummy",
              dtype="bfloat16" if on_tpu else "float32",
              quantization="pq",
              max_model_len=256, max_num_seqs=batch,
              max_num_batched_tokens=2048, block_size=16,
              gpu_memory_utilization=0.8,
              # size the pool to the workload: an oversized pool costs
              # ~14 ms/step (donation copies scale with pool size)
              num_kv_blocks=batch * (256 // 16) + 64 if on_tpu else None,
              enable_prefix_caching=True,
              # multi-step windows (N fused decode iterations per
              # dispatch) amortize per-dispatch overhead AND the PQ
              # window dequant; composed with lag-1 async scheduling so
              # the host schedules window i+1 while window i runs
              num_scheduler_steps=32 if on_tpu else 1,
              # lag-1 async scheduling: dispatch step i+1 before fetching
              # step i (hides dispatch + d2h latency)
              async_scheduling=True)

    rng = np.random.default_rng(0)
    prompts = [{"prompt_token_ids":
                rng.integers(10, model_cfg["vocab_size"] - 10,
                             prompt_len).tolist()}
               for _ in range(batch)]
    sp = SamplingParams(temperature=0.0, max_tokens=decode_steps,
                        ignore_eos=True)

    # warmup: compile prefill + decode buckets
    warm = [{"prompt_token_ids": p["prompt_token_ids"][:]}
            for p in prompts[:2]]
    llm.generate(warm, SamplingParams(temperature=0.0, max_tokens=4,
                                      ignore_eos=True))

    eng = llm.llm_engine
    for i, p in enumerate(prompts):
        eng.add_request(f"bench{i}", p, sp)
    # run prefill steps until all requests entered decode
    while True:
        sched = eng.engine_core.scheduler
        if (len(sched.waiting) == 0 and sched.running and
                all(r.num_computed_tokens >= r.num_prompt_tokens
                    for r in sched.running)):
            break
        eng.step()
        if not eng.has_unfinished_requests():
            break

    # a few untimed decode steps (2 multi-step windows) so the window
    # compile and any lazy init don't pollute the measurement
    emitted = {}

    def _new_tokens(outs):
        n = 0
        for o in outs:
            if not o.outputs:
                continue
            tot = len(o.outputs[0].token_ids)
            n += tot - emitted.get(o.request_id, 0)
            emitted[o.request_id] = tot
        return n

    # steady-state decode throughput: every window is a sample; the
    # median filters warm-up and compile outliers
    # per-step samples; the reported number is the MEDIAN full-window
    # rate, which is robust to one-time XLA compiles landing anywhere
    # in the run (the compile cache is not reliably shared across
    # processes on the tunneled runtime)
    samples = []
    dbg = os.environ.get("BENCH_DEBUG")
    while eng.has_unfinished_requests():
        ts = time.perf_counter()
        outs = eng.step()
        nt = _new_tokens(outs)
        dt_s = time.perf_counter() - ts
        samples.append((dt_s, nt))
        if dbg:
            print(f"timed step: {dt_s*1e3:.1f} ms, {nt} toks",
                  flush=True)
        if any(o.finished for o in outs):
            break
    full = batch * 32
    window_rates = sorted(nt / dt_s for dt_s, nt in samples
                          if nt >= full)
    if window_rates:
        tput = window_rates[len(window_rates) // 2]
    else:  # single-step fallback path
        tot_t = sum(d for d, _ in samples)
        tput = sum(n for _, n in samples) / max(tot_t, 1e-9)
    # drain the rest outside the timer
    while eng.has_unfinished_requests():
        eng.step()

    # roofline: per decode step the chip must stream PQ codes + bf16
    # embeddings/lm_head + the live KV prefix
    h = model_cfg["hidden_size"]
    inter = model_cfg["intermediate_size"]
    kvh = model_cfg["num_key_value_heads"]
    hq = model_cfg["num_attention_heads"]
    layers = model_cfg["num_hidden_layers"]
    head_dim = h // hq
    lin_params = layers * (h * hq * head_dim + 2 * h * kvh * head_dim +
                           hq * head_dim * h + 3 * h * inter)
    codes_bytes = lin_params // 4          # 2x8 = 2 bits/weight
    lm_head_bytes = model_cfg["vocab_size"] * h * 2
    avg_ctx = prompt_len + decode_steps / 2
    kv_bytes_step = batch * avg_ctx * layers * 2 * kvh * head_dim * 2
    hbm_bw = 819e9 if on_tpu else 50e9
    step_roofline = (codes_bytes + lm_head_bytes + kv_bytes_step) / hbm_bw
    roofline_tput = batch / step_roofline

    print(json.dumps({
        "metric": "decode_tok_s_per_chip",
        "value": round(tput, 1),
        "unit": "tok/s",
        "vs_baseline": round(tput / roofline_tput, 4),
    }))


if __name__ == "__main__":
    main()
