"""On-device tensorized sampler (role of reference ``v1/sample/sampler.py``
and the V0-TPU in-graph sampling, ``worker/tpu_model_runner.py:676-684``).

All sampling state is vectorized over the request axis so the whole step
(including sampling) is one jitted graph:
- temperature 0 => greedy (argmax);
- top-k / top-p / min-p via one shared descending sort;
- presence/frequency/repetition penalties from a device-resident token
  count matrix (updated by scatter inside the step fn);
- per-request seeded sampling via fold_in(seed, step);
- min_tokens enforced by masking the EOS logit.

Logprobs are computed from the *raw* (pre-penalty, pre-temperature)
logits, matching OpenAI semantics.
"""

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class SamplingState(NamedTuple):
    """Per-request vectors, all [S]-shaped device arrays."""
    temperature: jax.Array   # f32; 0 => greedy
    top_k: jax.Array         # i32; 0 => disabled
    top_p: jax.Array         # f32; 1 => disabled
    min_p: jax.Array         # f32; 0 => disabled
    presence_penalty: jax.Array    # f32
    frequency_penalty: jax.Array   # f32
    repetition_penalty: jax.Array  # f32; 1 => disabled
    seed: jax.Array          # u32 per-request seed
    has_seed: jax.Array      # bool: seeded => reproducible stream
    eos_token_id: jax.Array  # i32; -1 => none
    min_tokens: jax.Array    # i32
    output_len: jax.Array    # i32 generated so far


def apply_penalties(logits: jax.Array, counts: jax.Array,
                    prompt_mask: jax.Array,
                    state: SamplingState) -> jax.Array:
    """counts [S, V]: output-token counts; prompt_mask [S, V] bool:
    tokens present in the prompt (repetition penalty spans both,
    presence/frequency only outputs — reference semantics)."""
    rep = state.repetition_penalty[:, None]
    seen = prompt_mask | (counts > 0)
    l = jnp.where(seen & (logits > 0), logits / rep, logits)
    l = jnp.where(seen & (logits <= 0), l * rep, l)
    l = l - state.frequency_penalty[:, None] * counts
    l = l - state.presence_penalty[:, None] * (counts > 0)
    return l


def sample(
    logits: jax.Array,        # [S, V] f32
    state: SamplingState,
    step_key: jax.Array,      # base PRNG key for this step
    *,
    all_greedy: bool = False,
    counts: Optional[jax.Array] = None,
    prompt_mask: Optional[jax.Array] = None,
    logit_bias: Optional[jax.Array] = None,
):
    """Returns sampled token ids [S] (i32)."""
    s, v = logits.shape
    raw = logits

    if logit_bias is not None:
        logits = logits + logit_bias
    if counts is not None:
        logits = apply_penalties(logits, counts, prompt_mask, state)

    # min_tokens: mask EOS until enough tokens were generated
    eos = jnp.clip(state.eos_token_id, 0, v - 1)
    need_mask = (state.eos_token_id >= 0) & (state.output_len <
                                             state.min_tokens)
    onehot_rows = jnp.arange(s)
    logits = logits.at[onehot_rows, eos].add(
        jnp.where(need_mask, NEG_INF, 0.0))

    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if all_greedy:
        return greedy

    temp = jnp.maximum(state.temperature, 1e-6)[:, None]
    l = logits / temp

    # one descending sort shared by top-k / top-p / min-p
    sorted_l, sorted_idx = jax.lax.top_k(l, v)
    ranks = jnp.arange(v, dtype=jnp.int32)[None, :]

    k = jnp.where(state.top_k <= 0, v, state.top_k)[:, None]
    keep = ranks < k

    probs = jax.nn.softmax(sorted_l, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep &= (cum - probs) < state.top_p[:, None]

    keep &= probs >= (state.min_p[:, None] * probs[:, 0:1])
    keep = keep.at[:, 0].set(True)  # never mask the argmax

    masked = jnp.where(keep, sorted_l, NEG_INF)

    # per-request keys: seeded requests use a stream derived only from
    # (seed, output position) so re-runs reproduce exactly; unseeded
    # requests fold the step key with their row index.
    const_key = jax.random.PRNGKey(0x5EED)

    def row_sample(key, seed, has_seed, outlen, row_idx, row):
        k_seeded = jax.random.fold_in(
            jax.random.fold_in(const_key, seed), outlen)
        k_global = jax.random.fold_in(key, row_idx)
        kd = jnp.where(has_seed, jax.random.key_data(k_seeded),
                       jax.random.key_data(k_global))
        k2 = jax.random.wrap_key_data(kd)
        g = jax.random.gumbel(k2, (v,), dtype=jnp.float32)
        return jnp.argmax(row + g).astype(jnp.int32)

    row_idx = jnp.arange(s, dtype=jnp.uint32)
    pos = jax.vmap(row_sample, in_axes=(None, 0, 0, 0, 0, 0))(
        step_key, state.seed, state.has_seed, state.output_len,
        row_idx, masked)
    sampled = jnp.take_along_axis(sorted_idx, pos[:, None],
                                  axis=1)[:, 0].astype(jnp.int32)

    use_greedy = state.temperature == 0.0
    return jnp.where(use_greedy, greedy, sampled)


def compute_logprobs(raw_logits: jax.Array, sampled: jax.Array,
                     num_logprobs: int):
    """Top-k logprobs + the sampled token's logprob and rank.

    Returns (token_ids [S, k+1], logprobs [S, k+1], ranks [S]) where
    column 0 is the sampled token (reference v1 logprobs layout)."""
    logp = jax.nn.log_softmax(raw_logits, axis=-1)
    top_vals, top_ids = jax.lax.top_k(logp, num_logprobs)
    s = raw_logits.shape[0]
    rows = jnp.arange(s)
    samp_lp = logp[rows, sampled]
    rank = jnp.sum(logp > samp_lp[:, None], axis=-1).astype(jnp.int32)
    ids = jnp.concatenate([sampled[:, None], top_ids], axis=1)
    vals = jnp.concatenate([samp_lp[:, None], top_vals], axis=1)
    return ids.astype(jnp.int32), vals, rank
