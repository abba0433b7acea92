"""Speculative decoding: ngram proposer, on-device verification, and
end-to-end equivalence (spec on == spec off for greedy decoding) —
role of reference tests/spec_decode + v1 rejection-sampler tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_pq_tpu.spec_decode import NgramProposer

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 512,
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "num_key_value_heads": 2,
    "rms_norm_eps": 1e-5,
    "max_position_embeddings": 512,
}


# ---------------------------------------------------------------------------
# proposer


def test_ngram_basic_match():
    p = NgramProposer(min_n=2, max_n=3, num_spec_tokens=3)
    # history: ... (7 8) 9 10 ... (7 8) -> propose 9 10 ...
    toks = [1, 7, 8, 9, 10, 11, 5, 7, 8]
    assert p.propose(toks) == [9, 10, 11]


def test_ngram_no_match():
    p = NgramProposer(2, 3, 3)
    assert p.propose([1, 2, 3, 4, 5]) is None
    assert p.propose([1, 2]) is None


def test_ngram_prefers_most_recent():
    p = NgramProposer(2, 2, 2)
    toks = [7, 8, 1, 7, 8, 2, 9, 7, 8]
    assert p.propose(toks) == [2, 9]


def test_ngram_truncates_at_end():
    p = NgramProposer(2, 2, 5)
    toks = [7, 8, 1, 7, 8]
    # match at index 0..1, proposal = tokens[2:7] -> only [1, 7, 8]
    assert p.propose(toks) == [1, 7, 8]


# ---------------------------------------------------------------------------
# verification sampler


def _mk_state(s, temps):
    from vllm_pq_tpu.layers.sampler import SamplingState
    z = jnp.zeros(s)
    zi = jnp.zeros(s, jnp.int32)
    return SamplingState(
        temperature=jnp.asarray(temps, jnp.float32),
        top_k=zi, top_p=jnp.ones(s), min_p=z,
        presence_penalty=z, frequency_penalty=z,
        repetition_penalty=jnp.ones(s),
        seed=jnp.zeros(s, jnp.uint32), has_seed=jnp.zeros(s, bool),
        eos_token_id=jnp.full(s, -1, jnp.int32),
        min_tokens=zi, output_len=zi)


def test_verify_accept_prefix():
    from vllm_pq_tpu.layers.rejection import verify_and_sample
    s, k, v = 3, 3, 16
    logits = np.full((s, k + 1, v), -10.0, np.float32)
    # row 0: argmax = [5, 6, 7, 8]; drafts [5, 6, 9] -> accept 2, bonus 7
    for j, t in enumerate([5, 6, 7, 8]):
        logits[0, j, t] = 10.0
    # row 1: argmax = [3, ...]; drafts [4, ...] -> accept 0, bonus 3
    for j, t in enumerate([3, 3, 3, 3]):
        logits[1, j, t] = 10.0
    # row 2: no drafts (plain decode): emit argmax position 0 = 11
    for j, t in enumerate([11, 1, 2, 3]):
        logits[2, j, t] = 10.0
    drafts = np.array([[5, 6, 9], [4, 3, 3], [0, 0, 0]], np.int32)
    nd = np.array([3, 3, 0], np.int32)
    toks, gens = verify_and_sample(
        jnp.asarray(logits), jnp.asarray(drafts), jnp.asarray(nd),
        _mk_state(s, [0.0, 0.0, 0.0]), jax.random.PRNGKey(0),
        all_greedy=True)
    toks, gens = np.asarray(toks), np.asarray(gens)
    assert gens.tolist() == [3, 1, 1]
    assert toks[0, :3].tolist() == [5, 6, 7]
    assert toks[1, 0] == 3
    assert toks[2, 0] == 11


def test_verify_all_accepted():
    from vllm_pq_tpu.layers.rejection import verify_and_sample
    s, k, v = 1, 2, 8
    logits = np.full((s, k + 1, v), -10.0, np.float32)
    for j, t in enumerate([2, 3, 4]):
        logits[0, j, t] = 10.0
    toks, gens = verify_and_sample(
        jnp.asarray(logits), jnp.asarray([[2, 3]], dtype=np.int32),
        jnp.asarray([2], np.int32), _mk_state(1, [0.0]),
        jax.random.PRNGKey(0), all_greedy=True)
    assert int(np.asarray(gens)[0]) == 3
    assert np.asarray(toks)[0].tolist() == [2, 3, 4]


def test_verify_random_rows_fall_through():
    from vllm_pq_tpu.layers.rejection import verify_and_sample
    s, k, v = 2, 2, 32
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((s, k + 1, v)).astype(np.float32)
    toks, gens = verify_and_sample(
        jnp.asarray(logits), jnp.zeros((s, k), jnp.int32),
        jnp.zeros(s, jnp.int32), _mk_state(s, [0.8, 0.0]),
        jax.random.PRNGKey(1), all_greedy=False)
    gens = np.asarray(gens)
    assert gens.tolist() == [1, 1]
    # greedy row must be argmax of position 0
    assert int(np.asarray(toks)[1, 0]) == int(logits[1, 0].argmax())


# ---------------------------------------------------------------------------
# end-to-end: spec on == spec off for greedy


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_spec_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    return str(d)


def test_e2e_spec_equivalence(tiny_model_dir):
    from vllm_pq_tpu import LLM, SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    # prompts with strong repetition so ngram actually fires
    prompts = [
        {"prompt_token_ids": [7, 8, 9, 10, 7, 8, 9, 10, 7, 8]},
        {"prompt_token_ids": [3, 4, 5, 3, 4, 5, 3, 4]},
        {"prompt_token_ids": [100, 101, 102, 103, 104]},
    ]
    kwargs = dict(model=tiny_model_dir, load_format="dummy",
                  dtype="float32", max_model_len=128, max_num_seqs=8,
                  max_num_batched_tokens=128, block_size=16,
                  num_kv_blocks=64)
    base = LLM(**kwargs)
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    del base

    spec = LLM(speculative_method="ngram", num_speculative_tokens=3,
               **kwargs)
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    stats = spec.llm_engine.engine_core.make_stats()
    assert got == ref
    # the repeated prompts must actually exercise the spec path
    assert stats["spec_tokens_proposed"] > 0
    assert stats["spec_tokens_accepted"] > 0


def test_e2e_spec_with_random_mix(tiny_model_dir):
    """Random-sampling requests coexist with greedy spec requests."""
    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=tiny_model_dir, load_format="dummy",
              dtype="float32", max_model_len=128, max_num_seqs=8,
              max_num_batched_tokens=128, block_size=16, num_kv_blocks=64,
              speculative_method="ngram", num_speculative_tokens=3)
    prompts = [
        {"prompt_token_ids": [7, 8, 9, 10, 7, 8, 9, 10, 7, 8]},
        {"prompt_token_ids": [1, 2, 3, 4, 5, 6]},
    ]
    outs = llm.generate(
        prompts,
        [SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True),
         SamplingParams(temperature=0.9, max_tokens=16, seed=7,
                        ignore_eos=True)])
    assert all(len(o.outputs[0].token_ids) == 16 for o in outs)


# ---------------------------------------------------------------------------
# draft-model proposer (round 2; reference spec_decode/multi_step_worker
# + top1_proposer.py)


def test_e2e_draft_model_equivalence(tiny_model_dir):
    """Draft == target: greedy drafts are (nearly) always accepted and
    outputs stay token-exact vs non-speculative greedy."""
    from vllm_pq_tpu import LLM, SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    prompts = [
        {"prompt_token_ids": [7, 8, 9, 10, 11]},
        {"prompt_token_ids": [3, 4, 5]},
        {"prompt_token_ids": [100, 101, 102, 103, 104]},
    ]
    kwargs = dict(model=tiny_model_dir, load_format="dummy",
                  dtype="float32", max_model_len=128, max_num_seqs=8,
                  max_num_batched_tokens=128, block_size=16,
                  num_kv_blocks=64)
    base = LLM(**kwargs)
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    del base

    spec = LLM(speculative_method="draft_model",
               speculative_model=tiny_model_dir,
               num_speculative_tokens=3, **kwargs)
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    stats = spec.llm_engine.engine_core.make_stats()
    assert got == ref
    assert stats["spec_tokens_proposed"] > 0
    # identical draft: acceptance must be high (draft KV near a page
    # boundary may degrade an occasional late draft)
    assert (stats["spec_tokens_accepted"]
            >= 0.5 * stats["spec_tokens_proposed"]), stats


def test_e2e_draft_model_mixed_sampling(tiny_model_dir):
    """Non-greedy rows are excluded from drafting but still correct."""
    from vllm_pq_tpu import LLM, SamplingParams
    kwargs = dict(model=tiny_model_dir, load_format="dummy",
                  dtype="float32", max_model_len=128, max_num_seqs=8,
                  max_num_batched_tokens=128, block_size=16,
                  num_kv_blocks=64)
    spec = LLM(speculative_method="draft_model",
               speculative_model=tiny_model_dir,
               num_speculative_tokens=2, **kwargs)
    outs = spec.generate(
        [{"prompt_token_ids": [5, 6, 7]},
         {"prompt_token_ids": [8, 9, 10]}],
        [SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True),
         SamplingParams(temperature=0.9, seed=7, max_tokens=12,
                        ignore_eos=True)])
    assert all(len(o.outputs[0].token_ids) == 12 for o in outs)
