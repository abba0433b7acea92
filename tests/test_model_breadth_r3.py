"""Round-3 breadth families: Helium (HF-golden), EXAONE (HF-golden via
llama-math rename), MiniCPM neutral-scaler golden + scaled dummy, Orion
and StableLM-Epoch dummy coverage (reference models/{exaone,minicpm,
orion}.py, registry rows)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _compare(hf_model, llm, n_new=8, trials=2, seed=7):
    from vllm_pq_tpu import SamplingParams
    rng = np.random.default_rng(seed)
    for _ in range(trials):
        prompt = rng.integers(5, 500, int(rng.integers(4, 20))).tolist()
        with torch.no_grad():
            exp = hf_model.generate(
                torch.tensor([prompt]), max_new_tokens=n_new,
                do_sample=False, num_beams=1,
                pad_token_id=0)[0, len(prompt):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(temperature=0.0, max_tokens=n_new,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (got, exp)


def _llm(d, **kw):
    from vllm_pq_tpu import LLM
    return LLM(model=str(d), dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
               num_kv_blocks=64, enable_prefix_caching=False, **kw)


def _tiny_llama(tmp_path, name="hf", tie=False):
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(vocab_size=512, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512,
                      tie_word_embeddings=tie)
    torch.manual_seed(3)
    hf = LlamaForCausalLM(cfg).eval().float()
    d = tmp_path / name
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def test_helium_matches_hf(tmp_path):
    from transformers import HeliumConfig, HeliumForCausalLM
    cfg = HeliumConfig(vocab_size=512, hidden_size=128,
                       intermediate_size=256, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       head_dim=32, max_position_embeddings=512,
                       tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = HeliumForCausalLM(cfg).eval().float()
    d = tmp_path / "helium"
    hf.save_pretrained(d, safe_serialization=True)
    _compare(hf, _llm(d))


def test_exaone_matches_hf_via_rename(tmp_path):
    """EXAONE is llama math under a GPT-style checkpoint tree; build a
    real llama checkpoint, re-key it to EXAONE naming, and require
    token-exact generation parity with the original llama."""
    from safetensors.numpy import save_file
    from safetensors import safe_open

    d, hf = _tiny_llama(tmp_path)
    renamed = {}
    with safe_open(d / "model.safetensors", "np") as f:
        for k in f.keys():
            t = f.get_tensor(k)
            nk = (k.replace("model.layers.", "transformer.h.")
                  .replace("self_attn.q_proj", "attn.attention.q_proj")
                  .replace("self_attn.k_proj", "attn.attention.k_proj")
                  .replace("self_attn.v_proj", "attn.attention.v_proj")
                  .replace("self_attn.o_proj", "attn.attention.out_proj")
                  .replace("mlp.gate_proj", "mlp.c_fc_0")
                  .replace("mlp.up_proj", "mlp.c_fc_1")
                  .replace("mlp.down_proj", "mlp.c_proj")
                  .replace("input_layernorm", "ln_1")
                  .replace("post_attention_layernorm", "ln_2")
                  .replace("model.embed_tokens", "transformer.wte")
                  .replace("model.norm", "transformer.ln_f"))
            renamed[nk] = t
    ed = tmp_path / "exaone"
    ed.mkdir()
    save_file(renamed, ed / "model.safetensors")
    with open(ed / "config.json", "w") as f:
        json.dump({
            "architectures": ["ExaoneForCausalLM"],
            "vocab_size": 512, "hidden_size": 128,
            "intermediate_size": 256, "num_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "layer_norm_epsilon": 1e-6, "rope_theta": 10000.0,
            "max_position_embeddings": 512,
            "activation_function": "silu",
        }, f)
    _compare(hf, _llm(ed))


def test_minicpm_neutral_scalers_match_llama(tmp_path):
    """With scale_emb=1, scale_depth=sqrt(L), dim_model_base=hidden the
    MiniCPM scalers are identity and the model is exactly llama."""
    d, hf = _tiny_llama(tmp_path, tie=True)
    with open(d / "config.json") as f:
        raw = json.load(f)
    raw["architectures"] = ["MiniCPMForCausalLM"]
    raw["scale_emb"] = 1.0
    raw["scale_depth"] = float(np.sqrt(raw["num_hidden_layers"]))
    raw["dim_model_base"] = raw["hidden_size"]
    with open(d / "config.json", "w") as f:
        json.dump(raw, f)
    _compare(hf, _llm(d))


@pytest.mark.parametrize("arch,extra", [
    ("MiniCPMForCausalLM", {"scale_emb": 12.0, "scale_depth": 1.4,
                            "dim_model_base": 64,
                            "tie_word_embeddings": True}),
    ("OrionForCausalLM", {}),
    ("StableLMEpochForCausalLM", {"norm_eps": 1e-5, "rope_pct": 0.25}),
])
def test_family_generates_dummy(arch, extra, tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    cfg = {"architectures": [arch], "vocab_size": 512,
           "hidden_size": 128, "intermediate_size": 256,
           "num_hidden_layers": 2, "num_attention_heads": 2,
           "num_key_value_heads": 2, "max_position_embeddings": 512}
    cfg.update(extra)
    d = tmp_path / arch
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    llm = LLM(model=str(d), load_format="dummy", dtype="float32",
              max_model_len=128, max_num_seqs=4,
              max_num_batched_tokens=128, block_size=16, num_kv_blocks=64)
    outs = llm.generate(
        [{"prompt_token_ids": [5, 6, 7, 8]}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 6
