"""MLP-speculator draft heads (role of reference
``model_executor/models/mlp_speculator.py`` — "Accelerating Production
LLMs with Combined Token/Embedding Speculators", arXiv:2404.19124).

Head i advances a recurrent draft state from the target model's last
hidden state and the previously emitted/drafted token:

    state_0 = h_last                  (optionally L2-scaled: ln0/sqrt 2)
    z_i     = emb_i[token]
    state_i = GELU(ln_i(proj_i(state_{i-1}) + z_i * emb_w / state_w))
    token_i = argmax(head_i(state_i))

Like the medusa heads, evaluation happens IN-GRAPH at the tail of the
fused step — drafts ride the same device->host fetch as the sampled
tokens. Greedy/stochastic verification keeps outputs token-exact
regardless of head quality.

Checkpoint layout (HF/IBM speculators): ``emb.{i}.weight``,
``proj.{i}.weight``, ``head.{i}.weight``, ``ln.{i}.weight/bias``
(optionally under a ``speculator.`` prefix); config carries n_predict /
emb_dim / inner_dim / tie_weights / scale_input.
"""

import json
import math
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)


def load_mlp_speculator(path: str, dtype) -> Tuple[Dict, int]:
    """Returns (params, n_predict). params:
    {"heads": [{"emb": [V, D], "proj": [Din, D], "head": [D, V],
                "ln_w": [D], "ln_b": [D]}...],
     "scale_input": bool, "state_w": f, "emb_w": f}"""
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    n_predict = int(cfg.get("n_predict", 3))
    tie = bool(cfg.get("tie_weights", False))
    scale_input = bool(cfg.get("scale_input", False))

    from safetensors import safe_open
    tensors: Dict[str, np.ndarray] = {}
    for fn in sorted(os.listdir(path)):
        if fn.endswith(".safetensors"):
            with safe_open(os.path.join(path, fn), framework="np") as f:
                for k in f.keys():
                    kk = k
                    if kk.startswith("speculator."):
                        kk = kk[len("speculator."):]
                    tensors[kk] = f.get_tensor(k)

    def idx(i):
        # tied checkpoints store one shared stage (proj keeps index 0/1)
        return 0 if tie and f"emb.{i}.weight" not in tensors else i

    heads = []
    for i in range(n_predict):
        j = idx(i)
        pj = (min(i, 1) if tie and f"proj.{i}.weight" not in tensors
              else i)
        heads.append({
            "emb": jnp.asarray(tensors[f"emb.{j}.weight"], dtype),
            "proj": jnp.asarray(tensors[f"proj.{pj}.weight"].T, dtype),
            "head": jnp.asarray(tensors[f"head.{j}.weight"].T, dtype),
            "ln_w": jnp.asarray(tensors[f"ln.{j}.weight"], dtype),
            "ln_b": jnp.asarray(tensors[f"ln.{j}.bias"], dtype),
        })
    state_w = 0.5 ** (0.5 / n_predict)
    inner = heads[0]["proj"].shape[1]
    emb_w = math.sqrt((1 - state_w ** 2) * (inner / 2))
    logger.info("mlp_speculator: %d heads (inner %d, tie=%s) from %s",
                n_predict, inner, tie, path)
    return {"heads": heads, "scale_input": scale_input,
            "state_w": state_w, "emb_w": emb_w}, n_predict


def _l2norm(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    return (x32 * jax.lax.rsqrt(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)).astype(x.dtype)


def mlp_spec_drafts(spec: Dict, h: jax.Array,
                    last_tok: jax.Array, *, scale_input=None,
                    alpha=None) -> jax.Array:
    """h [S, hidden], last_tok i32[S] -> greedy drafts [S, K] i32.

    ``scale_input``/``alpha`` are STATIC (python) values; when None they
    are read from the spec dict (eager use). Under jit, pass them
    explicitly so only the head arrays trace."""
    state = h
    if scale_input is None:
        scale_input = bool(spec["scale_input"])
    if alpha is None:
        alpha = float(spec["emb_w"]) / float(spec["state_w"])
    if scale_input:
        state = _l2norm(state) / (2.0 ** 0.5)
    tok = last_tok
    outs = []
    for head in spec["heads"]:
        z = head["emb"][jnp.clip(tok, 0, head["emb"].shape[0] - 1)]
        s2 = jnp.dot(state, head["proj"],
                     preferred_element_type=jnp.float32).astype(h.dtype)
        s2 = s2 + z * jnp.asarray(alpha, z.dtype)
        s2 = _l2norm(s2) * head["ln_w"] + head["ln_b"]
        state = jax.nn.gelu(s2.astype(jnp.float32)).astype(h.dtype)
        logits = jnp.dot(state, head["head"],
                         preferred_element_type=jnp.float32)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        outs.append(tok)
    return jnp.stack(outs, axis=1)
