"""Headline benchmark: PQ decode throughput per chip.

Runs the REAL engine (continuous batching, paged KV, PQ Pallas matmuls,
ragged-paged-attention kernel, on-device sampling) on PQ models with
dummy weights (throughput does not depend on weight values; this image
has no network for checkpoints).

Configs measured (BASELINE.md staged configs):
  * flagship  — config #2: TinyLlama-1.1B PQ, 1 chip, batch 256
  * llama2_7b — config #3 minus TP: Llama-2-7B PQ, 1 chip (north-star
    model scale; exercises the fused PQ path since the dense
    window-dequant cache cannot hold 13.5 GB)

Prints ONE JSON line (always — even on total failure):
  {"metric": "decode_tok_s_per_chip", "value": N, "unit": "tok/s",
   "vs_baseline": N / roofline, "extras": {...}, "error": null|str}
where roofline is the weight+KV HBM-streaming bound for the measured
batch/context on v5e (819 GB/s), i.e. vs_baseline == 1.0 means
memory-bandwidth speed-of-light (BASELINE.md north-star: >= 0.9 x the
weight-only roofline).

Robustness (round-2 lesson: the TPU tunnel can hang *inside* backend
init, so in-process retries don't help):
  * the parent process never imports jax; each measurement runs in a
    child process under a hard timeout,
  * backend init is probed with a tiny matmul child first (fail fast),
  * probe failures retry with backoff; after the retry budget the
    parent falls back to JAX_PLATFORMS=cpu for a smoke number with an
    explicit "error" field rather than crashing,
  * the parent always exits 0 with a parseable JSON line.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# overall wall-clock budget for the whole bench (parent enforces)
DEADLINE_S = float(os.environ.get("VPQ_BENCH_DEADLINE_S", "2700"))
_T0 = time.time()


def _left():
    return DEADLINE_S - (time.time() - _T0)


def _log(msg):
    print(f"[bench +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


# --------------------------------------------------------------------------
# parent-side orchestration
# --------------------------------------------------------------------------

PROBE_SRC = """
import jax, numpy as np
x = jax.numpy.ones((128, 128), jax.numpy.bfloat16)
y = (x @ x)
v = np.asarray(jax.device_get(y.ravel()[:1]).astype(jax.numpy.float32))
assert abs(float(v[0]) - 128.0) < 1.0, v
print("PROBE_OK", jax.devices()[0].platform)
"""


def _run_child(argv, timeout_s, env_extra=None):
    """Run a child python process; return (rc, stdout, stderr)."""
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vpq_jax_cache")
    if env_extra:
        env.update(env_extra)
    try:
        p = subprocess.run(argv, capture_output=True, text=True,
                           timeout=timeout_s, env=env, cwd=REPO)
        return p.returncode, p.stdout, p.stderr
    except subprocess.TimeoutExpired as e:
        def _s(b):
            if isinstance(b, bytes):
                return b.decode("utf-8", "replace")
            return b or ""
        return -9, _s(e.stdout), _s(e.stderr) + "\nTIMEOUT"


def probe_backend(timeout_s):
    """Fail-fast backend probe in a killable child. Returns platform or None."""
    rc, out, err = _run_child([sys.executable, "-c", PROBE_SRC], timeout_s)
    for line in out.splitlines():
        if line.startswith("PROBE_OK"):
            return line.split()[1]
    _log(f"probe failed rc={rc}: {err.strip().splitlines()[-1] if err.strip() else 'no stderr'}")
    return None


def _cpu_env():
    """Env that forces the CPU backend AND disables the axon TPU-tunnel
    plugin (its registration hook can hang at import when the tunnel is
    down, even under JAX_PLATFORMS=cpu — round-2 lesson)."""
    return {
        "JAX_PLATFORMS": "cpu",
        "VPQ_FORCE_CPU": "1",
        "PYTHONPATH": ":".join(
            p for p in os.environ.get("PYTHONPATH", "").split(":")
            if ".axon_site" not in p),
    }


def run_measurement(model, timeout_s, force_cpu=False, env_extra=None):
    """Run one measurement child; returns parsed dict or None."""
    if force_cpu:
        env_extra = dict(_cpu_env(), **(env_extra or {}))
    rc, out, err = _run_child(
        [sys.executable, os.path.abspath(__file__), "--child", model],
        timeout_s, env_extra)
    parsed = None
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                pass
    if parsed is None:
        tail = "\n".join((err or out).strip().splitlines()[-6:])
        _log(f"child({model}) rc={rc} produced no JSON; tail:\n{tail}")
    return parsed


def parent_main():
    result = {"metric": "decode_tok_s_per_chip", "value": 0.0,
              "unit": "tok/s", "vs_baseline": 0.0, "extras": {},
              "error": None}
    errors = []

    # The driver may SIGTERM/SIGKILL the whole bench at its own wall
    # clock. Round-4 lesson (VERDICT r4 missing #1): a single print at
    # the end loses EVERYTHING already measured. So (a) a cumulative
    # JSON line is printed after every stage — the driver parses the
    # LAST parseable line, so a mid-stage kill still leaves the latest
    # complete snapshot on stdout; (b) SIGTERM/SIGINT dump the current
    # snapshot before exiting.
    def _emit(partial=True):
        result["error"] = "; ".join(errors) if errors else None
        if partial and not errors:
            result["error"] = None
        print(json.dumps(result), flush=True)

    def _on_term(signum, frame):
        errors.append(f"killed by signal {signum} at "
                      f"+{time.time() - _T0:.0f}s")
        _emit()
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    # 1. fail-fast probe with retries + backoff; the TOTAL retry budget
    # is capped (~4.5 min) so a degraded tunnel cannot eat the
    # measurement window (round 4 burned 560 s here)
    platform = None
    probe_deadline = time.time() + float(
        os.environ.get("VPQ_BENCH_PROBE_BUDGET_S", "270"))
    for attempt in range(4):
        budget = min(60 + 45 * attempt,
                     max(probe_deadline - time.time(), 45))
        _log(f"backend probe attempt {attempt + 1} (timeout {budget:.0f}s)")
        platform = probe_backend(budget)
        if platform:
            break
        if time.time() > probe_deadline or _left() < 700:
            break
        time.sleep(min(10 * (attempt + 1),
                       max(probe_deadline - time.time(), 1)))
    on_tpu = platform == "tpu"
    _log(f"probe result: platform={platform}")

    if platform is None:
        errors.append("tpu backend unavailable after probe retries")

    # 2. flagship measurement (first-attempt budget capped so a retry
    # and the later stages always remain possible)
    flagship = None
    if platform is not None:
        for attempt in range(2):
            budget = min(_left() - (300 if attempt == 0 else 30), 1100)
            if budget < 180:
                errors.append("deadline exhausted before flagship run")
                break
            _log(f"flagship run attempt {attempt + 1} "
                 f"(timeout {budget:.0f}s)")
            flagship = run_measurement("flagship", budget)
            if flagship is not None:
                break
            errors.append(f"flagship child attempt {attempt + 1} failed")

    # 3. CPU smoke fallback so the driver always gets a real measurement
    if flagship is None:
        budget = max(min(_left() - 30, 900), 120)
        _log(f"falling back to CPU smoke (timeout {budget:.0f}s)")
        flagship = run_measurement("flagship", budget, force_cpu=True)
        if flagship is not None:
            flagship["platform"] = "cpu-fallback"
            errors.append("value measured on CPU fallback, not TPU")

    if flagship is not None:
        result.update({k: flagship[k] for k in
                       ("value", "vs_baseline", "vs_strategy")
                       if k in flagship})
        result["extras"]["flagship"] = flagship
    _emit()

    # 4. north-star-scale 7B measurement (best effort, never blocks headline)
    if on_tpu and flagship is not None and _left() > 420 \
            and not os.environ.get("VPQ_BENCH_SKIP_7B"):
        budget = min(_left() - 260, 1100)
        _log(f"llama2_7b run (timeout {budget:.0f}s)")
        seven = run_measurement("llama2_7b", budget)
        if seven is not None:
            result["extras"]["llama2_7b"] = seven
        else:
            errors.append("llama2_7b child failed")
        _emit()
    elif on_tpu:
        errors.append("llama2_7b skipped (deadline or env)")

    # 5. small-batch latency + long-context rows (best effort;
    #    VERDICT r3 #3 and weak #7). The fused-PQ A/B streams codes
    #    per step instead of the resident-dense weights.
    if on_tpu and flagship is not None:
        for name, env in (
                ("smallbatch", None),
                ("smallbatch_fused", {"VPQ_PQ_RESIDENT": "0",
                                      "VPQ_WINDOW_DEQUANT": "0"}),
                ("longctx", None),
                # spec x multi-step windows A/B (VERDICT r4 #5)
                ("specwin", None)):
            if _left() < 260:
                errors.append(f"{name} skipped (deadline)")
                continue
            # specwin boots TWO engines (plain + spec arm): wider budget
            budget = min(_left() - 40, 800 if name == "specwin" else 500)
            _log(f"{name} run (timeout {budget:.0f}s)")
            extra = run_measurement(name.replace("_fused", ""), budget,
                                    env_extra=env)
            if extra is not None:
                result["extras"][name] = extra
            else:
                errors.append(f"{name} child failed")
            _emit()

    _emit(partial=False)
    return 0


# --------------------------------------------------------------------------
# child-side measurement
# --------------------------------------------------------------------------

MODEL_CFGS = {
    # flagship config #2 (BASELINE.md): TinyLlama-1.1B PQ, 1 chip
    "flagship": {
        "architectures": ["LlamaForCausalLM"],
        "vocab_size": 32000, "hidden_size": 2048,
        "intermediate_size": 5632, "num_hidden_layers": 22,
        "num_attention_heads": 32, "num_key_value_heads": 4,
        "rms_norm_eps": 1e-5, "max_position_embeddings": 2048,
    },
    # north-star config #3 model (Llama-2-7B), single chip. MHA: KV is
    # 0.5 MB/token, so batch/context are sized to HBM.
    "llama2_7b": {
        "architectures": ["LlamaForCausalLM"],
        "vocab_size": 32000, "hidden_size": 4096,
        "intermediate_size": 11008, "num_hidden_layers": 32,
        "num_attention_heads": 32, "num_key_value_heads": 32,
        "rms_norm_eps": 1e-5, "max_position_embeddings": 4096,
    },
}

BENCH_PLANS = {
    #                 batch  prompt decode  max_len  sched_steps
    "flagship":      (256,   32,    193,    256,     32),
    "llama2_7b":     (64,    32,    97,     160,     16),
    # small-batch latency configs (VERDICT r3 #3): where codes-streaming
    # was supposed to win; measured resident vs fused-PQ (the fused A/B
    # runs the same plan with VPQ_PQ_RESIDENT=0 VPQ_WINDOW_DEQUANT=0)
    "smallbatch":    (8,     32,    193,    256,     16),
    # driver-visible long-context decode row (VERDICT r3 weak #7)
    "longctx":       (64,    992,   193,    1216,    32),
}
# smallbatch/longctx reuse the flagship model config
MODEL_CFGS["smallbatch"] = MODEL_CFGS["flagship"]
MODEL_CFGS["longctx"] = MODEL_CFGS["flagship"]


def child_specwin():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/vpq_jax_cache")
    """Speculative multi-step windows on the flagship config (VERDICT
    r4 missing #5 done-criterion): batch-256 decode windows WITH
    in-graph medusa drafts vs plain windows, same child process.

    Acceptance control: the dummy-loaded flagship is made degenerate
    on device (o_proj/down_proj zeroed, tied embeddings, medusa lm =
    embed^T) so it repeats its input token and the heads propose
    exactly the model's next token — the measured uplift is the
    window MECHANICS' best case at the stated acceptance, both
    reported."""
    os.environ.setdefault("VPQ_PAGES_FIXED", "1")
    os.environ.setdefault("VPQ_PQ_RESIDENT", "int8")
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vllm_pq_tpu import LLM, SamplingParams

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    model_cfg = dict(MODEL_CFGS["flagship"])
    model_cfg["tie_word_embeddings"] = True
    # batch 32 default: at batch 256 the decode iteration is COMPUTE-
    # bound on this chip, so K+1-token verification scales time with
    # tokens and speculation cannot win (measured 19.3k vs 23.8k tok/s
    # at 100% acceptance — BENCHMARKS.md round 5); the bandwidth-bound
    # small-batch regime is where the weight-stream amortization pays
    batch = int(os.environ.get("VPQ_BENCH_SPEC_BATCH", "32"))
    prompt_len, decode_steps, sched_steps = 32, 193, 32
    spec_k = int(os.environ.get("VPQ_BENCH_SPEC_K", "2"))
    max_len = 512  # spec windows reserve n*(k+1) slots of headroom
    if not on_tpu:
        model_cfg.update(hidden_size=256, intermediate_size=512,
                         num_hidden_layers=2, num_attention_heads=8,
                         num_key_value_heads=4, vocab_size=2048)
        batch, decode_steps, sched_steps = 8, 24, 4
        max_len = 128

    d = tempfile.mkdtemp()
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(model_cfg, f)
    # medusa dir: 0 resblocks (head = bare lm matrix, overwritten with
    # the device embedding after load)
    hd = tempfile.mkdtemp()
    from safetensors.numpy import save_file
    rng = np.random.default_rng(0)
    save_file({f"{i}.0.weight":
               (rng.standard_normal(
                   (model_cfg["vocab_size"],
                    model_cfg["hidden_size"])) * 0.02).astype(
                       np.float32)
               for i in range(spec_k)},
              os.path.join(hd, "medusa_lm_head.safetensors"))
    with open(os.path.join(hd, "config.json"), "w") as f:
        json.dump({"medusa_num_heads": spec_k,
                   "medusa_num_layers": 0}, f)

    kw = dict(load_format="dummy",
              dtype="bfloat16" if on_tpu else "float32",
              quantization="pq",
              kv_cache_dtype="int8" if on_tpu else "auto",
              max_model_len=max_len, max_num_seqs=batch,
              max_num_batched_tokens=2048, block_size=16,
              gpu_memory_utilization=0.8,
              num_kv_blocks=batch * (max_len // 16) + 64
              if on_tpu else None,
              enable_prefix_caching=True,
              num_scheduler_steps=sched_steps)

    def degenerate(llm):
        r = llm.llm_engine.engine_core.runner
        p = r.params
        for L in p["layers"]:
            for nm in ("o_proj", "down_proj"):
                L[nm] = jax.tree.map(jnp.zeros_like, L[nm])
        # iid-gaussian embedding: argmax(e_t . E^T) == t w.h.p., so
        # every row is a REPEAT fixed point (the dummy loader's embed
        # lands rows in period-2 cycles a one-position-tied head
        # mispredicts at draft >= 2)
        emb = p["embed_tokens"]["weight"]
        g = np.random.default_rng(1).standard_normal(
            emb.shape).astype(np.float32) * 0.02
        p["embed_tokens"]["weight"] = jnp.asarray(g, emb.dtype)
        # unit final norm: dummy per-channel norm weights break the
        # self-similarity argmax
        p["norm"] = jax.tree.map(jnp.ones_like, p["norm"])
        if r.medusa_heads is not None:
            emb_t = p["embed_tokens"]["weight"].T
            r.medusa_heads = [{"res": [], "lm": emb_t}
                              for _ in range(spec_k)]

    # dev bisect hooks (BENCH_DEBUG prints per-window walls)
    stub = os.environ.get("VPQ_SPECWIN_STUB", "")
    if stub == "attn":
        import vllm_pq_tpu.ops.window_attention as _wa

        def _stub_attn(q, wc, spec_md, *, sm_scale,
                       sliding_window=None, soft_cap=None):
            return q
        _wa.window_attention_spec = _stub_attn
    elif stub == "medusa":
        import vllm_pq_tpu.spec_decode.medusa as _md

        def _stub_drafts(heads, h):
            return jnp.zeros((h.shape[0], len(heads)), jnp.int32)
        _md.medusa_drafts = _stub_drafts

    def run_arm(spec):
        extra = (dict(speculative_method="medusa",
                      speculative_model=hd,
                      num_speculative_tokens=spec_k)
                 if spec else dict(async_scheduling=True))
        llm = LLM(model=d, **kw, **extra)
        degenerate(llm)
        rng = np.random.default_rng(0)
        prompts = [{"prompt_token_ids":
                    rng.integers(10, model_cfg["vocab_size"] - 10,
                                 prompt_len).tolist()}
                   for _ in range(batch)]
        eng = llm.llm_engine
        # warm at FULL batch: the window variant is keyed by the token
        # bucket, so only a full-width batch compiles the graphs the
        # timed phase runs (the first TPU measurement put the spec
        # window's one-time compile INSIDE the timed samples: 55 tok/s
        # artifact at 98% acceptance)
        warm_sp = SamplingParams(temperature=0.0,
                                 max_tokens=decode_steps,
                                 ignore_eos=True)
        for i, p2 in enumerate(prompts):
            eng.add_request(f"warm{i}", p2, warm_sp)
        while eng.has_unfinished_requests():
            eng.step()
        sched0 = eng.engine_core.scheduler
        sched0.spec_stats_proposed = 0
        sched0.spec_stats_accepted = 0
        sp = SamplingParams(temperature=0.0, max_tokens=decode_steps,
                            ignore_eos=True)
        for i, p2 in enumerate(prompts):
            eng.add_request(f"sw{i}", p2, sp)
        while True:
            sched = eng.engine_core.scheduler
            if (len(sched.waiting) == 0 and sched.running and
                    all(r.num_computed_tokens >= r.num_prompt_tokens
                        for r in sched.running)):
                break
            eng.step()
            if not eng.has_unfinished_requests():
                break
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
        samples = []
        dbg = os.environ.get("BENCH_DEBUG")
        while eng.has_unfinished_requests():
            ts = time.perf_counter()
            outs = eng.step()
            nt = _new_tokens(outs)
            samples.append((time.perf_counter() - ts, nt))
            if dbg:
                print(f"specwin[{'spec' if spec else 'plain'}] step: "
                      f"{(time.perf_counter() - ts) * 1e3:.1f} ms, "
                      f"{nt} toks", file=sys.stderr, flush=True)
            if any(o.finished for o in outs):
                break
        # abort the tail: the sub-window leftovers would compile the
        # single-step decode variant this benchmark never needs
        sched = eng.engine_core.scheduler
        eng.engine_core.abort_requests(
            [r.request_id for r in list(sched.running)]
            + [r.request_id for r in list(sched.waiting)])
        while eng.has_unfinished_requests():
            eng.step()
        prop, acc = sched.spec_stats_proposed, sched.spec_stats_accepted
        # aggregate over busy windows, dropping the slowest (compile)
        busy = [(dt, nt) for dt, nt in samples if nt > 0]
        if len(busy) >= 3:
            busy.remove(max(busy))
        tput = (sum(n for _, n in busy)
                / max(sum(dt for dt, _ in busy), 1e-9))
        del llm
        import gc
        gc.collect()
        return tput, prop, acc

    plain_tput, _, _ = run_arm(False)
    spec_tput, prop, acc = run_arm(True)
    print(json.dumps({
        "metric": "specwin_decode_tok_s", "platform": platform,
        "batch": batch, "spec_k": spec_k,
        "value": round(spec_tput, 1), "unit": "tok/s",
        "plain_tok_s": round(plain_tput, 1),
        "uplift": round(spec_tput / max(plain_tput, 1e-9), 3),
        "acceptance": round(acc / max(prop, 1), 4),
        "proposed": prop, "accepted": acc,
    }), flush=True)


def child_main(model_name):
    # direct --child invocations (dev A/Bs) get the same persistent
    # compile cache as parent-spawned children
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/vpq_jax_cache")
    if model_name == "specwin":
        return child_specwin()
    # flagship: one compiled variant per step kind — kills the two
    # ~5-minute mid-run window recompiles (pages-bucket growth) on a
    # cold cache (measured 23.9k vs 22.1k tok/s). The 7B config's
    # non-pow2 fixed bucket (10 pages) regresses its decode 7x, so it
    # keeps the pow2 ladder.
    if model_name in ("flagship", "smallbatch", "longctx"):
        os.environ.setdefault("VPQ_PAGES_FIXED", "1")
    if model_name in ("flagship", "longctx"):
        # w8a8-resident weights: measured fastest batched serving form
        # (BENCHMARKS.md round 4: 1.60 ms linear stack vs 2.72 dense);
        # smallbatch keeps auto (bf16-dense) as the resident arm its
        # fused-PQ comparison is defined against
        os.environ.setdefault("VPQ_PQ_RESIDENT", "int8")
    if os.environ.get("VPQ_FORCE_CPU"):
        # the axon sitecustomize may have registered the tunnel backend
        # at interpreter start; undo it before any backend initializes
        # (same recipe as tests/conftest.py)
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax._src.xla_bridge as _xb
        _xb._backend_factories.pop("axon", None)
    import jax
    import numpy as np

    from vllm_pq_tpu import LLM, SamplingParams

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    model_cfg = dict(MODEL_CFGS[model_name])
    batch, prompt_len, decode_steps, max_len, sched_steps = \
        BENCH_PLANS[model_name]
    # A/B knobs (profiling/tuning; the driver runs defaults)
    sched_steps = int(os.environ.get("VPQ_BENCH_N", sched_steps))
    batch = int(os.environ.get("VPQ_BENCH_BATCH", batch))
    prompt_len = int(os.environ.get("VPQ_BENCH_PROMPT", prompt_len))
    max_len = int(os.environ.get("VPQ_BENCH_MAXLEN", max_len))
    decode_steps = int(os.environ.get("VPQ_BENCH_STEPS", decode_steps))
    if not on_tpu:  # CPU smoke fallback: tiny model
        model_cfg.update(hidden_size=256, intermediate_size=512,
                         num_hidden_layers=2, num_attention_heads=8,
                         num_key_value_heads=4, vocab_size=2048)
        batch, decode_steps, sched_steps = 8, 16, 1

    import tempfile
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(model_cfg, f)

    block_size = int(os.environ.get("VPQ_BENCH_BLOCK", "16"))
    llm = LLM(model=d, load_format="dummy",
              dtype="bfloat16" if on_tpu else "float32",
              quantization="pq",
              # 7B MHA: bf16 KV (5.5 GiB) + int8-resident weights
              # (6 GiB) + HLO temps exceed the 15.75 GiB HBM; int8 KV
              # halves the cache and is the capacity lever this config
              # exists to exercise (reference cache_dtype=fp8 role)
              # flagship: int8 KV is a measured +15% bandwidth win on
              # top of w8a8-resident weights (BENCHMARKS.md round 4);
              # 7B: int8 KV is the capacity lever (fit at all)
              kv_cache_dtype=os.environ.get(
                  "VPQ_BENCH_KV_DTYPE",
                  "int8" if (on_tpu and model_name in
                             ("llama2_7b", "flagship", "longctx"))
                  else "auto"),
              max_model_len=max_len, max_num_seqs=batch,
              max_num_batched_tokens=2048, block_size=block_size,
              gpu_memory_utilization=0.8,
              # size the pool to the workload: an oversized pool costs
              # ~14 ms/step (donation copies scale with pool size)
              num_kv_blocks=batch * (max_len // block_size) + 64
              if on_tpu else None,
              enable_prefix_caching=True,
              # multi-step windows (N fused decode iterations per
              # dispatch) amortize per-dispatch overhead AND the PQ
              # window dequant; composed with lag-1 async scheduling so
              # the host schedules window i+1 while window i runs
              num_scheduler_steps=sched_steps,
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

    # warmup: compile prefill + decode buckets. SKIPPED for the
    # multi-step-window configs: the tiny warm generation compiles the
    # SINGLE-STEP t=64 prefill and t=16 decode variants that the
    # windowed main run never executes — measured 25 minutes of remote
    # compile on a degraded tunnel for graphs the benchmark does not
    # need (the tail past the measured windows is ABORTED below for
    # the same reason).
    if sched_steps <= 1:
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

    # steady-state decode throughput: every full multi-step window is a
    # sample; the reported number is the MEDIAN full-window rate, which
    # is robust to one-time XLA compiles landing anywhere in the run
    # (the compile cache is not reliably shared across processes on the
    # tunneled runtime)
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
                  file=sys.stderr, flush=True)
        if any(o.finished for o in outs):
            break
    # Steady-state throughput = AGGREGATE tokens/time over full windows
    # after dropping the slowest one (a window that absorbed an XLA
    # compile). A per-window median is NOT robust here: with lag-1
    # async scheduling a fetch can return while the next window
    # computes, making individual windows look arbitrarily fast (a
    # 70 ms "window" of 16k tokens was observed); aggregates conserve
    # wall-clock so pipelining artifacts cancel.
    full = batch * sched_steps
    wins = [(dt_s, nt) for dt_s, nt in samples if nt >= full]
    if len(wins) >= 3:
        wins.remove(max(wins))  # drop the compile-afflicted window
        tput = sum(n for _, n in wins) / sum(d for d, _ in wins)
    elif wins:
        tput = sum(n for _, n in wins) / sum(d for d, _ in wins)
    else:  # single-step fallback path
        tot_t = sum(d for d, _ in samples)
        tput = sum(n for _, n in samples) / max(tot_t, 1e-9)
    # drain the rest outside the timer
    while eng.has_unfinished_requests():
        eng.step()

    # roofline: per decode step the chip must stream PQ codes + bf16
    # embeddings/lm_head + the live KV prefix. The KV term uses the
    # bytes the task minimally needs WITH THE CHOSEN cache dtype
    # (VERDICT r3 weak #4: an int8-KV run must not be scored against a
    # bf16-KV denominator).
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
    kv_int8 = type(llm.llm_engine.engine_core.runner
                   .kv_caches[0]).__name__ == "QuantKV"
    # int8 cache: 1 B/elem + one f32 scale per (token, head)
    kv_elem_bytes = (1 + 4 / head_dim) if kv_int8 else 2
    kv_bytes_step = int(batch * avg_ctx * layers * 2 * kvh *
                        head_dim * kv_elem_bytes)
    hbm_bw = 819e9 if on_tpu else 50e9
    step_roofline = (codes_bytes + lm_head_bytes + kv_bytes_step) / hbm_bw
    roofline_tput = batch / step_roofline

    # strategy roofline (BASELINE.md addendum, VERDICT r4 #6): the
    # speed-of-light of the CHOSEN serving strategy — the weight bytes
    # the resident form actually streams per step (int8-resident: 1 B,
    # bf16-resident: 2 B per linear weight) + lm_head + the chosen KV
    # dtype's bytes. codes-roofline 0.9 is measured-infeasible on this
    # hardware (one-hot 2x8 MXU dequant: 5.4-7.0 G weights/s vs the
    # 43.6 needed — BENCHMARKS.md round 4); this is the honest target.
    method_name = type(llm.llm_engine.engine_core.runner
                       .model.linear_method).__name__
    if method_name in ("Int8W8A8LinearMethod", "Int8LinearMethod"):
        strat_weight_bytes = lin_params          # int8-resident: 1 B
    elif method_name == "PQLinearMethod":
        strat_weight_bytes = codes_bytes         # fused-PQ streams codes
    else:
        strat_weight_bytes = lin_params * 2      # bf16-dense resident
    strat_roofline = ((strat_weight_bytes + lm_head_bytes + kv_bytes_step)
                      / hbm_bw)
    strat_tput = batch / strat_roofline

    print(json.dumps({
        "metric": "decode_tok_s_per_chip",
        "model": model_name,
        "platform": platform,
        "batch": batch,
        "value": round(tput, 1),
        "unit": "tok/s",
        "vs_baseline": round(tput / roofline_tput, 4),
        "vs_strategy": round(tput / strat_tput, 4),
        "strategy_roofline_tok_s": round(strat_tput, 1),
    }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child_main(sys.argv[2])
    else:
        sys.exit(parent_main())
