"""On-device draft-token verification for speculative decoding.

Role of the reference's ``v1/sample/rejection_sampler.py``: given target
logits at the draft positions, emit the longest accepted prefix plus one
bonus token. With the ngram proposer the draft distribution is a point
mass, so greedy verification (draft accepted iff it equals the target
argmax) is exact target-distribution sampling for temperature 0 — the
V1 scope at the reference snapshot.

Rows with ``num_drafts == 0`` (random-sampling requests, logprob
requests, prefill completions) fall through to the regular sampler on
position 0; everything stays one jitted function of static shape
``[S, K+1, V]``.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from vllm_pq_tpu.layers.sampler import SamplingState, sample


def verify_and_sample(
    logits: jax.Array,       # [S, K+1, V] f32 (position 0 = last real tok)
    drafts: jax.Array,       # i32[S, K]
    num_drafts: jax.Array,   # i32[S]
    state: SamplingState,
    step_key: jax.Array,
    *,
    all_greedy: bool = False,
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
    if not all_greedy:
        # random-sampling rows carry no drafts; their position-0 logits
        # are the last real token's, so the regular sampler is exact.
        t0 = sample(logits[:, 0], state, step_key)
        is_random = state.temperature > 0.0
        tokens = tokens.at[:, 0].set(jnp.where(is_random, t0, tokens[:, 0]))
        num_generated = jnp.where(is_random, 1, num_generated)
    return tokens, num_generated
