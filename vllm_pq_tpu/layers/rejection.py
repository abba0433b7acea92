"""On-device draft-token verification for speculative decoding.

Role of the reference's rejection samplers (``v1/sample/
rejection_sampler.py`` greedy scope + V0 ``layers/rejection_sampler.py``
stochastic semantics):

- Greedy rows (temperature 0): draft accepted iff it equals the target
  argmax — exact for point-mass targets.
- Sampled rows (temperature > 0): our proposers (ngram, greedy draft
  model) propose deterministically, so the proposal distribution is a
  point mass q = delta(draft). Standard speculative sampling then
  reduces to: accept draft d_i with probability p_i(d_i) (the processed
  target probability); on first rejection sample from the residual
  max(p_i - q_i, 0) ∝ p_i with d_i masked out; if all K accepted, sample
  the bonus token from p_K. This preserves the target distribution
  exactly (Leviathan et al. 2023 Thm 1 with q a point mass).

Processed p_i applies the same temperature / top-k / top-p / min-p /
min-tokens pipeline as layers/sampler.py. Rows with penalties or
constraints carry no drafts (scheduler eligibility), so counts are not
consulted here.

Rows with ``num_drafts == 0`` (prefill completions, penalty/constraint/
logprob rows) fall through to the regular sampler on position 0;
everything stays one jitted function of static shape ``[S, K+1, V]``.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from vllm_pq_tpu.layers.sampler import NEG_INF, SamplingState, sample


def _process_logits(logits: jax.Array, state: SamplingState,
                    pos_offset: jax.Array) -> jax.Array:
    """sampler.py's masking pipeline for one draft position.

    logits [S, V]; pos_offset [S] = output_len delta of this position.
    Returns masked, temperature-scaled logits (softmax of which is the
    processed target distribution p_i)."""
    s, v = logits.shape
    # min_tokens: EOS masked until enough tokens generated
    eos = jnp.clip(state.eos_token_id, 0, v - 1)
    outlen = state.output_len + pos_offset
    need_mask = (state.eos_token_id >= 0) & (outlen < state.min_tokens)
    logits = logits.at[jnp.arange(s), eos].add(
        jnp.where(need_mask, NEG_INF, 0.0))

    temp = jnp.maximum(state.temperature, 1e-6)[:, None]
    l = logits / temp

    sorted_l, sorted_idx = jax.lax.top_k(l, v)
    ranks = jnp.arange(v, dtype=jnp.int32)[None, :]
    k = jnp.where(state.top_k <= 0, v, state.top_k)[:, None]
    keep = ranks < k
    probs = jax.nn.softmax(sorted_l, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep &= (cum - probs) < state.top_p[:, None]
    keep &= probs >= (state.min_p[:, None] * probs[:, 0:1])
    keep = keep.at[:, 0].set(True)
    masked_sorted = jnp.where(keep, sorted_l, NEG_INF)
    # unsort back to vocab order (scatter by the sort permutation)
    return jnp.full_like(l, NEG_INF).at[
        jnp.arange(s)[:, None], sorted_idx].set(masked_sorted)


def _row_keys(state: SamplingState, step_key: jax.Array,
              pos_offset: jax.Array, salt: int) -> jax.Array:
    """Per-row PRNG keys: seeded rows derive only from (seed, output
    position) so re-runs reproduce; unseeded fold the step key + row."""
    const_key = jax.random.PRNGKey(0x5EED ^ salt)
    s = state.seed.shape[0]

    def one(seed, has_seed, outlen, row_idx):
        k_seeded = jax.random.fold_in(
            jax.random.fold_in(const_key, seed), outlen)
        k_global = jax.random.fold_in(
            jax.random.fold_in(step_key, salt), row_idx)
        kd = jnp.where(has_seed, jax.random.key_data(k_seeded),
                       jax.random.key_data(k_global))
        return jax.random.wrap_key_data(kd)

    return jax.vmap(one)(state.seed, state.has_seed,
                         state.output_len + pos_offset,
                         jnp.arange(s, dtype=jnp.uint32))


def verify_and_sample(
    logits: jax.Array,       # [S, K+1, V] f32 (position 0 = last real tok)
    drafts: jax.Array,       # i32[S, K]
    num_drafts: jax.Array,   # i32[S]
    state: SamplingState,
    step_key: jax.Array,
    *,
    all_greedy: bool = False,
    counts: jax.Array = None,
    prompt_mask: jax.Array = None,
    acceptance_method: str = "rejection_sampler",
    posterior_threshold: float = 0.09,
    posterior_alpha: float = 0.3,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens [S, K+1] i32, num_generated [S] i32).

    tokens[:, :num_generated] are valid; the host slices per row.
    """
    s, k1, v = logits.shape
    k = k1 - 1
    greedy_toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [S, K+1]

    pos = jnp.arange(k, dtype=jnp.int32)[None, :]
    match = (drafts == greedy_toks[:, :-1]) & (pos < num_drafts[:, None])
    accept = jnp.cumprod(match.astype(jnp.int32), axis=1)  # [S, K]
    num_accepted = jnp.sum(accept, axis=1)                  # [S]
    num_generated = num_accepted + 1

    tokens = greedy_toks
    if all_greedy:
        return tokens, num_generated

    is_random = state.temperature > 0.0
    has_drafts = num_drafts > 0

    # ---- stochastic rejection for sampled rows WITH drafts ----
    # processed logits per position (vmap over the K+1 axis)
    offs = jnp.arange(k1, dtype=jnp.int32)
    proc = jax.vmap(lambda lg, off: _process_logits(lg, state,
                                                    jnp.full((s,), off)),
                    in_axes=(1, 0), out_axes=1)(logits, offs)
    probs = jax.nn.softmax(proc, axis=-1)          # [S, K+1, V]
    p_draft = jnp.take_along_axis(
        probs[:, :k], jnp.clip(drafts, 0, v - 1)[..., None],
        axis=2)[..., 0]                             # [S, K]

    # acceptance coin per (row, position): u_i < p_i(d_i), with
    # per-position keys under the seeded-stream discipline
    us = []
    for i in range(k):
        keys_i = _row_keys(state, step_key, jnp.full((s,), i, jnp.int32),
                           salt=0x0ACC + i)
        us.append(jax.vmap(lambda kk: jax.random.uniform(kk, ()))(keys_i))
    u = jnp.stack(us, axis=1) if k else jnp.zeros((s, 0))  # [S, K]

    if acceptance_method == "typical_acceptance_sampler":
        # reference layers/typical_acceptance_sampler.py: accept the
        # draft when its posterior probability clears an entropy-scaled
        # threshold; looser than exact rejection, bounded shift
        plog = jnp.log(jnp.clip(probs[:, :k], 1e-20, 1.0))
        entropy = -jnp.sum(probs[:, :k] * plog, axis=-1)      # [S, K]
        thresh = jnp.minimum(
            jnp.asarray(posterior_threshold, jnp.float32),
            jnp.sqrt(posterior_alpha) * jnp.exp(-entropy))
        match_st = (p_draft > thresh) & (pos < num_drafts[:, None])
    else:
        match_st = (u < p_draft) & (pos < num_drafts[:, None])
    acc_st = jnp.cumprod(match_st.astype(jnp.int32), axis=1)
    num_acc_st = jnp.sum(acc_st, axis=1)            # [S]

    # recovery/bonus position: num_acc_st in [0, K]
    rec_logits = jnp.take_along_axis(
        proc, num_acc_st[:, None, None], axis=1)[:, 0]    # [S, V]
    # a real rejection (not the bonus position) masks the rejected draft
    rejected = num_acc_st < num_drafts
    rej_draft = jnp.take_along_axis(
        drafts, jnp.clip(num_acc_st, 0, max(k - 1, 0))[:, None],
        axis=1)[:, 0] if k else jnp.zeros((s,), jnp.int32)
    rec_logits = rec_logits.at[jnp.arange(s),
                               jnp.clip(rej_draft, 0, v - 1)].add(
        jnp.where(rejected, NEG_INF, 0.0))

    rec_keys = _row_keys(state, step_key, num_acc_st, salt=0x0E5A)
    gumb = jax.vmap(lambda kk: jax.random.gumbel(kk, (v,),
                                                 dtype=jnp.float32))(
        rec_keys)
    rec_tok = jnp.argmax(rec_logits + gumb, axis=-1).astype(jnp.int32)

    # token matrix for stochastic rows: accepted drafts then recovery
    tok_st = jnp.where(pos < num_acc_st[:, None], drafts,
                       jnp.zeros_like(drafts))
    tok_st = jnp.concatenate(
        [tok_st, jnp.zeros((s, 1), jnp.int32)], axis=1)   # [S, K+1]
    tok_st = tok_st.at[jnp.arange(s), num_acc_st].set(rec_tok)
    gen_st = num_acc_st + 1

    # ---- draftless sampled rows: regular sampler on position 0 ----
    # (penalized/constrained rows never carry drafts, so their
    # penalties apply here and only here)
    t0 = sample(logits[:, 0], state, step_key, counts=counts,
                prompt_mask=prompt_mask)

    take_st = is_random & has_drafts
    take_t0 = is_random & ~has_drafts
    tokens = jnp.where(take_st[:, None], tok_st, tokens)
    tokens = tokens.at[:, 0].set(
        jnp.where(take_t0, t0, tokens[:, 0]))
    num_generated = jnp.where(take_st, gen_st,
                              jnp.where(take_t0, 1, num_generated))
    return tokens, num_generated
