"""Medusa draft heads: hidden-state-conditioned speculative proposals
(role of reference ``vllm/model_executor/models/medusa.py:37`` and the
EAGLE/MLP-speculator head family, ``models/eagle.py:44``).

Head i is ``lm_i(resblock_i^L(h))`` where h is the target model's last
hidden state at the most recent emitted token; its argmax approximates
the token i+1 positions ahead. Unlike the reference (a separate worker
proposes between steps), the heads are evaluated IN-GRAPH at the tail
of the fused step — the drafts ride the same device->host fetch as the
sampled tokens, costing zero extra dispatches (the right trade on a
latency-dominated TPU path).

Checkpoint layout: HF Medusa (FasterDecoding) — safetensors keys
``{i}.{j}.linear.weight/bias`` for ResBlock j of head i and
``{i}.{L}.weight`` for the final vocab projection (torch [out, in]
layout, transposed on load); an optional ``medusa_head.`` key prefix is
stripped. ``config.json`` carries medusa_num_heads / medusa_num_layers.
"""

import json
import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)


def load_medusa_heads(path: str, dtype) -> Tuple[List[Dict], int]:
    """Returns (head param list, num_heads). Each head:
    {"res": [{"w": [h,h], "b": [h]}...], "lm": [h, v]}."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    num_heads = int(cfg.get("medusa_num_heads", cfg.get("num_heads", 4)))
    num_layers = int(cfg.get("medusa_num_layers",
                             cfg.get("num_hidden_layers", 1)))

    from safetensors import safe_open
    tensors: Dict[str, np.ndarray] = {}
    for fn in sorted(os.listdir(path)):
        if fn.endswith(".safetensors"):
            with safe_open(os.path.join(path, fn), framework="np") as f:
                for k in f.keys():
                    kk = k
                    for pre in ("medusa_head.", "medusa_heads."):
                        if kk.startswith(pre):
                            kk = kk[len(pre):]
                    tensors[kk] = f.get_tensor(k)
    heads = []
    for i in range(num_heads):
        res = []
        for j in range(num_layers):
            w = tensors[f"{i}.{j}.linear.weight"]  # [h, h] torch layout
            b = tensors.get(f"{i}.{j}.linear.bias",
                            np.zeros(w.shape[0], np.float32))
            res.append({"w": jnp.asarray(w.T, dtype),
                        "b": jnp.asarray(b, dtype)})
        lm = tensors[f"{i}.{num_layers}.weight"]   # [v, h] torch layout
        heads.append({"res": res, "lm": jnp.asarray(lm.T, dtype)})
    logger.info("medusa: %d heads x %d resblocks loaded from %s",
                num_heads, num_layers, path)
    return heads, num_heads


def medusa_drafts(heads: List[Dict], h: jax.Array) -> jax.Array:
    """h [S, hidden] -> greedy drafts [S, K] i32 (one per head)."""
    outs = []
    for head in heads:
        x = h
        for blk in head["res"]:
            x = x + jax.nn.silu(
                jnp.dot(x, blk["w"],
                        preferred_element_type=jnp.float32).astype(x.dtype)
                + blk["b"])
        logits = jnp.dot(x, head["lm"],
                         preferred_element_type=jnp.float32)
        outs.append(jnp.argmax(logits, axis=-1).astype(jnp.int32))
    return jnp.stack(outs, axis=1)
