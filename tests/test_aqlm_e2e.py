"""AQLM-format end-to-end golden test (role of reference
tests/models/decoder_only/language/test_aqlm.py:27-70, which pins greedy
strings from a published AQLM checkpoint; no network here, so the golden
reference is the SAME checkpoint dequantized to dense weights — the
engine must produce token-identical greedy output through the full
AQLM-safetensors -> converter -> PQ inference path, for both the 2x8
and the flagship 1x16 format)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
st = pytest.importorskip("safetensors.torch")

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 512,
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "rms_norm_eps": 1e-5,
    "max_position_embeddings": 512,
    "tie_word_embeddings": False,
}

LINEARS = [("self_attn.q_proj", 128, 128), ("self_attn.k_proj", 128, 64),
           ("self_attn.v_proj", 128, 64), ("self_attn.o_proj", 128, 128),
           ("mlp.gate_proj", 128, 256), ("mlp.up_proj", 128, 256),
           ("mlp.down_proj", 256, 128)]


def _mk_aqlm_linear(rng, i, o, nbits, m, g=8):
    c = 1 << nbits
    dt = np.int8 if nbits == 8 else np.int16
    codes = rng.integers(-(c // 2), c // 2,
                         (o, i // g, m)).astype(dt)        # signed HF form
    codebooks = (rng.standard_normal((m, c, 1, g)) * 0.5
                 ).astype(np.float32)
    scales = (rng.standard_normal((o, 1, 1, 1)) * 0.05 + 0.2
              ).astype(np.float32)
    # dense equivalent (AQLM semantics: sum of codebook entries x scale)
    ucodes = codes.astype(np.int64) + c // 2
    w = np.zeros((o, i), np.float32)
    for k in range(m):
        ent = codebooks[k, ucodes[..., k], 0, :]           # [o, i/g, g]
        w += ent.reshape(o, i)
    w = w * scales.reshape(o, 1)                           # [o, i] HF form
    return codes, codebooks, scales, w


def _save_pair(tmp_path, nbits, m):
    """Writes an AQLM checkpoint and its dense dequantized twin."""
    rng = np.random.default_rng(42 + nbits + m)
    base = {}
    h, v = TINY["hidden_size"], TINY["vocab_size"]
    base["model.embed_tokens.weight"] = (
        rng.standard_normal((v, h)) * 0.05).astype(np.float32)
    base["lm_head.weight"] = (
        rng.standard_normal((v, h)) * 0.05).astype(np.float32)
    base["model.norm.weight"] = np.ones(h, np.float32)
    aqlm, dense = dict(base), dict(base)
    for li in range(TINY["num_hidden_layers"]):
        p = f"model.layers.{li}."
        for nm in ("input_layernorm", "post_attention_layernorm"):
            wnorm = np.ones(h, np.float32)
            aqlm[p + nm + ".weight"] = wnorm
            dense[p + nm + ".weight"] = wnorm
        for nm, i, o in LINEARS:
            codes, cbs, scs, w = _mk_aqlm_linear(rng, i, o, nbits, m)
            aqlm[p + nm + ".codes"] = codes
            aqlm[p + nm + ".codebooks"] = cbs
            aqlm[p + nm + ".scales"] = scs
            dense[p + nm + ".weight"] = w

    def save(d, tensors, qcfg=None):
        d.mkdir()
        cfg = dict(TINY)
        if qcfg:
            cfg["quantization_config"] = qcfg
        with open(d / "config.json", "w") as f:
            json.dump(cfg, f)
        st.save_file({k: torch.from_numpy(np.ascontiguousarray(v))
                      for k, v in tensors.items()},
                     str(d / "model.safetensors"))

    da = tmp_path / f"aqlm_{nbits}_{m}"
    dd = tmp_path / f"dense_{nbits}_{m}"
    save(da, aqlm, {"quant_method": "aqlm", "in_group_size": 8,
                    "nbits_per_codebook": nbits, "num_codebooks": m,
                    "out_group_size": 1})
    save(dd, dense)
    return str(da), str(dd)


def _greedy(model_dir, prompts, n_new=12):
    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    sp = SamplingParams(temperature=0.0, max_tokens=n_new,
                        ignore_eos=True)
    return [o.outputs[0].token_ids
            for o in llm.generate(prompts, sp)]


@pytest.mark.parametrize("nbits,m", [(8, 2), (16, 1)])
def test_aqlm_checkpoint_matches_dense(tmp_path, nbits, m):
    """2x8 and flagship 1x16: greedy output through the AQLM loader+PQ
    path is token-identical to the dequantized dense twin."""
    da, dd = _save_pair(tmp_path, nbits, m)
    prompts = [{"prompt_token_ids": [7, 8, 9, 10, 11]},
               {"prompt_token_ids": [100, 101, 102]}]
    ref = _greedy(dd, prompts)
    got = _greedy(da, prompts)
    assert got == ref


def test_ppl_harness_runs(tmp_path):
    """benchmark_ppl.py runs end-to-end on the synthetic corpus and a
    dense tiny model; the ppl of a structured stream must be finite and
    below the uniform bound."""
    import math
    import subprocess
    import sys
    import os
    d = tmp_path / "m"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "benchmarks", "benchmark_ppl.py"),
         "--model", str(d), "--load-format", "dummy",
         "--dtype", "float32", "--chunk-len", "64", "--max-chunks", "2"],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["metric"] == "perplexity"
    assert math.isfinite(res["value"]) and res["value"] > 0
