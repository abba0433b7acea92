"""Host-side sampling for rows with per-request logits processors
(role of the reference's sampling_params.py ``logits_processors`` +
V0 sampler host application, ``layers/sampler.py`` _apply_logits_
processors).

Arbitrary Python callables cannot run inside the jitted step, so rows
carrying processors ship their full post-constraint logits to host; the
processors run here and the token is re-sampled with the request's
sampling params, overriding the in-graph sample. The engine forces sync
single-step composition for such rows (like constrained requests), so
the next step's input token always comes from this host state.

Processor signatures supported (both reference forms):
  ``proc(output_token_ids, logits) -> logits``
  ``proc(prompt_token_ids, output_token_ids, logits) -> logits``
"""

import inspect
from typing import List, Sequence

import numpy as np


def apply_logits_processors(processors: Sequence, prompt_token_ids:
                            List[int], output_token_ids: List[int],
                            logits: np.ndarray) -> np.ndarray:
    logits = np.asarray(logits, np.float32).copy()
    for proc in processors:
        try:
            n_args = len(inspect.signature(proc).parameters)
        except (TypeError, ValueError):
            n_args = 2
        if n_args >= 3:
            out = proc(prompt_token_ids, output_token_ids, logits)
        else:
            out = proc(output_token_ids, logits)
        if out is not None:
            logits = np.asarray(out, np.float32)
    return logits


def host_sample(logits: np.ndarray, request) -> int:
    """Sample one token from processed logits with the request's
    temperature / top-k / top-p (greedy when temperature == 0)."""
    sp = request.sampling_params
    if sp.temperature == 0.0:
        return int(np.argmax(logits))
    rng = getattr(request, "_host_rng", None)
    if rng is None:
        seed = sp.seed
        if seed is None:
            seed = abs(hash(request.request_id)) % (2 ** 31)
        rng = np.random.default_rng(seed)
        request._host_rng = rng
    logits = logits.astype(np.float64) / sp.temperature
    if sp.top_k and sp.top_k > 0:
        kth = np.partition(logits, -sp.top_k)[-sp.top_k]
        logits = np.where(logits < kth, -np.inf, logits)
    probs = np.exp(logits - np.max(logits))
    probs /= probs.sum()
    if sp.top_p < 1.0:
        order = np.argsort(-probs)
        csum = np.cumsum(probs[order])
        # keep the minimal prefix with mass >= top_p
        cut = int(np.searchsorted(csum, sp.top_p)) + 1
        keep = np.zeros_like(probs, bool)
        keep[order[:cut]] = True
        probs = np.where(keep, probs, 0.0)
        probs /= probs.sum()
    return int(rng.choice(len(probs), p=probs))
