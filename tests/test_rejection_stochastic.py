"""Stochastic rejection sampling (layers/rejection.py): sampled rows
with drafts must preserve the target distribution exactly (point-mass
proposals: accept w.p. p(draft), recover from p with the draft masked),
reference V0 rejection_sampler semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_pq_tpu.layers.rejection import verify_and_sample
from vllm_pq_tpu.layers.sampler import SamplingState


def mk_state(s, temperature=1.0, top_k=0, top_p=1.0, seed=None):
    z = jnp.zeros((s,), jnp.float32)
    zi = jnp.zeros((s,), jnp.int32)
    return SamplingState(
        temperature=jnp.full((s,), temperature, jnp.float32),
        top_k=jnp.full((s,), top_k, jnp.int32),
        top_p=jnp.full((s,), top_p, jnp.float32),
        min_p=z, presence_penalty=z, frequency_penalty=z,
        repetition_penalty=jnp.ones((s,), jnp.float32),
        seed=(jnp.full((s,), seed, jnp.uint32) if seed is not None
              else jnp.zeros((s,), jnp.uint32)),
        has_seed=jnp.full((s,), seed is not None, bool),
        eos_token_id=jnp.full((s,), -1, jnp.int32),
        min_tokens=zi, output_len=zi)


def test_greedy_rows_unchanged():
    s, k, v = 4, 2, 16
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((s, k + 1, v)), jnp.float32)
    exp = np.asarray(jnp.argmax(logits, -1))
    drafts = jnp.asarray(exp[:, :k])  # perfect drafts
    nd = jnp.full((s,), k, jnp.int32)
    st = mk_state(s, temperature=0.0)
    toks, gen = verify_and_sample(logits, drafts, nd, st,
                                  jax.random.PRNGKey(0))
    assert np.all(np.asarray(gen) == k + 1)
    np.testing.assert_array_equal(np.asarray(toks), exp)


def test_distribution_preserved_single_draft():
    """Emitted first token over many independent rows must match the
    processed target distribution regardless of the draft content."""
    s, v = 4096, 8
    rng = np.random.default_rng(1)
    base = rng.standard_normal(v).astype(np.float32)
    p = np.exp(base) / np.exp(base).sum()
    logits = jnp.asarray(np.tile(base, (s, 2, 1)), jnp.float32)
    for draft_tok in (int(np.argmax(p)), int(np.argmin(p))):
        drafts = jnp.full((s, 1), draft_tok, jnp.int32)
        nd = jnp.ones((s,), jnp.int32)
        st = mk_state(s, temperature=1.0)
        toks, gen = verify_and_sample(logits, drafts, nd, st,
                                      jax.random.PRNGKey(7))
        first = np.asarray(toks[:, 0])
        freq = np.bincount(first, minlength=v) / s
        # 4-sigma binomial tolerance per bucket + slack
        tol = 4 * np.sqrt(p * (1 - p) / s) + 0.01
        assert np.all(np.abs(freq - p) <= tol), (freq, p, draft_tok)


def test_acceptance_rate_tracks_draft_quality():
    s, v = 2048, 32
    rng = np.random.default_rng(2)
    base = rng.standard_normal(v).astype(np.float32)
    base[5] += 8.0  # sharply peaked at token 5
    logits = jnp.asarray(np.tile(base, (s, 2, 1)), jnp.float32)
    nd = jnp.ones((s,), jnp.int32)
    st = mk_state(s, temperature=1.0)
    _, gen_good = verify_and_sample(logits, jnp.full((s, 1), 5, jnp.int32),
                                    nd, st, jax.random.PRNGKey(3))
    _, gen_bad = verify_and_sample(logits, jnp.full((s, 1), 9, jnp.int32),
                                   nd, st, jax.random.PRNGKey(3))
    acc_good = float(np.mean(np.asarray(gen_good) == 2))
    acc_bad = float(np.mean(np.asarray(gen_bad) == 2))
    assert acc_good > 0.95, acc_good
    assert acc_bad < 0.05, acc_bad


def test_rejected_draft_never_reemitted_zero_prob():
    """With top-k=1 the processed dist is a point mass at the argmax; a
    wrong draft must always be rejected and the argmax emitted."""
    s, v = 256, 16
    rng = np.random.default_rng(3)
    base = rng.standard_normal(v).astype(np.float32)
    am = int(np.argmax(base))
    wrong = (am + 1) % v
    logits = jnp.asarray(np.tile(base, (s, 2, 1)), jnp.float32)
    st = mk_state(s, temperature=1.0, top_k=1)
    toks, gen = verify_and_sample(logits, jnp.full((s, 1), wrong,
                                                   jnp.int32),
                                  jnp.ones((s,), jnp.int32), st,
                                  jax.random.PRNGKey(11))
    assert np.all(np.asarray(gen) == 1)
    assert np.all(np.asarray(toks[:, 0]) == am)


def test_mixed_batch_routing():
    """Greedy rows, sampled rows with drafts, and draftless sampled rows
    coexist in one call."""
    s, k, v = 6, 2, 16
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((s, k + 1, v)), jnp.float32)
    am = np.asarray(jnp.argmax(logits, -1))
    drafts = jnp.asarray(am[:, :k])
    nd = jnp.asarray([k, k, 0, 0, k, 0], jnp.int32)
    st = mk_state(s, temperature=1.0)
    st = st._replace(temperature=jnp.asarray(
        [0.0, 0.0, 0.0, 1.0, 1.0, 1.0], jnp.float32))
    toks, gen = verify_and_sample(logits, drafts, nd, st,
                                  jax.random.PRNGKey(5))
    gen = np.asarray(gen)
    toks = np.asarray(toks)
    # row 0: greedy with perfect drafts -> K+1; row 1: greedy perfect
    assert gen[0] == k + 1 and gen[1] == k + 1
    # rows 2, 3, 5: no drafts -> exactly 1 token
    assert gen[2] == 1 and gen[3] == 1 and gen[5] == 1
    # greedy draftless row 2 emits the argmax
    assert toks[2, 0] == am[2, 0]
    # sampled row with perfect (argmax) drafts: 1..K+1 tokens
    assert 1 <= gen[4] <= k + 1


def test_seeded_rows_reproducible():
    s, k, v = 8, 2, 16
    rng = np.random.default_rng(6)
    logits = jnp.asarray(rng.standard_normal((s, k + 1, v)), jnp.float32)
    drafts = jnp.asarray(rng.integers(0, v, (s, k)), jnp.int32)
    nd = jnp.full((s,), k, jnp.int32)
    st = mk_state(s, temperature=1.0, seed=1234)
    t1, g1 = verify_and_sample(logits, drafts, nd, st,
                               jax.random.PRNGKey(1))
    t2, g2 = verify_and_sample(logits, drafts, nd, st,
                               jax.random.PRNGKey(999))  # different step
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_e2e_sampled_rows_get_drafts(tmp_path):
    """Engine-level: a temperature>0, top_k=1 request (stochastic verify
    path, deterministic content) must accept ngram drafts and match the
    greedy output exactly."""
    import json as _json

    from vllm_pq_tpu import LLM, SamplingParams
    cfg = {"architectures": ["LlamaForCausalLM"], "vocab_size": 512,
           "hidden_size": 128, "intermediate_size": 256,
           "num_hidden_layers": 2, "num_attention_heads": 2,
           "num_key_value_heads": 2, "max_position_embeddings": 512}
    d = tmp_path / "m"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        _json.dump(cfg, f)
    llm = LLM(model=str(d), load_format="dummy", dtype="float32",
              max_model_len=128, max_num_seqs=8, block_size=16,
              num_kv_blocks=64, speculative_method="ngram",
              num_speculative_tokens=3)
    sched = llm.llm_engine.engine_core.scheduler
    prompt = [{"prompt_token_ids": [5, 6, 7, 5, 6, 7, 5, 6, 7]}]
    g = llm.generate(prompt, SamplingParams(
        temperature=0.0, max_tokens=24, ignore_eos=True)
    )[0].outputs[0].token_ids
    p0, a0 = sched.spec_stats_proposed, sched.spec_stats_accepted
    s = llm.generate(prompt, SamplingParams(
        temperature=0.7, top_k=1, max_tokens=24, ignore_eos=True)
    )[0].outputs[0].token_ids
    assert list(s) == list(g)
    assert sched.spec_stats_proposed - p0 > 0
    assert sched.spec_stats_accepted - a0 > 0


def test_typical_acceptance_accepts_confident_drafts():
    """Typical acceptance (reference layers/typical_acceptance_sampler):
    a draft with dominant target probability is accepted even when the
    rejection coin would sometimes refuse; a low-probability draft under
    a confident (low-entropy) target is refused."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vllm_pq_tpu.layers.rejection import verify_and_sample
    from vllm_pq_tpu.layers.sampler import SamplingState

    s, k, v = 2, 2, 16
    logits = np.full((s, k + 1, v), -10.0, np.float32)
    # row 0: target puts ~all mass on token 3 at both draft positions
    logits[0, :, 3] = 10.0
    # row 1: target confident on token 5; draft will be 7 (wrong)
    logits[1, :, 5] = 10.0
    drafts = np.array([[3, 3], [7, 7]], np.int32)
    state = SamplingState(
        temperature=jnp.full((s,), 1.0), top_k=jnp.zeros(s, jnp.int32),
        top_p=jnp.ones(s), min_p=jnp.zeros(s),
        presence_penalty=jnp.zeros(s), frequency_penalty=jnp.zeros(s),
        repetition_penalty=jnp.ones(s),
        seed=jnp.zeros(s, jnp.uint32),
        has_seed=jnp.zeros(s, bool),
        eos_token_id=jnp.full((s,), -1, jnp.int32),
        min_tokens=jnp.zeros(s, jnp.int32),
        output_len=jnp.zeros(s, jnp.int32))
    toks, gens = verify_and_sample(
        jnp.asarray(logits), jnp.asarray(drafts),
        jnp.asarray([2, 2], jnp.int32), state, jax.random.PRNGKey(0),
        acceptance_method="typical_acceptance_sampler")
    gens = np.asarray(gens)
    toks = np.asarray(toks)
    assert gens[0] == 3  # both drafts accepted + bonus
    assert list(toks[0][:2]) == [3, 3]
    assert gens[1] == 1  # first draft rejected immediately
    assert toks[1][0] == 5  # greedy-confident recovery
