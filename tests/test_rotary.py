"""Rope scaling variants vs the transformers oracle
(ROPE_INIT_FUNCTIONS): linear / dynamic-NTK / YaRN / Phi3-LongRoPE /
Llama3 frequency tables and attention scaling must match (reference
``layers/rotary_embedding.py`` variants)."""

import numpy as np
import pytest
import torch
from transformers import LlamaConfig
from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

from vllm_pq_tpu.layers.rotary import build_rope_cache

DIM, BASE, ORIG = 64, 10000.0, 256

CASES = {
    "default": None,
    "linear": {"rope_type": "linear", "factor": 4.0},
    "dynamic": {"rope_type": "dynamic", "factor": 4.0},
    "yarn": {"rope_type": "yarn", "factor": 4.0,
             "original_max_position_embeddings": ORIG},
    "llama3": {"rope_type": "llama3", "factor": 8.0,
               "low_freq_factor": 1.0, "high_freq_factor": 4.0,
               "original_max_position_embeddings": ORIG},
    "longrope": {"rope_type": "longrope",
                 "short_factor": [1.0 + 0.01 * i for i in range(DIM // 2)],
                 "long_factor": [2.0 + 0.05 * i for i in range(DIM // 2)],
                 "original_max_position_embeddings": ORIG},
}


def _hf_table(rope_type, scaling, max_pos, seq_len):
    cfg = LlamaConfig(hidden_size=DIM * 2, num_attention_heads=2,
                      rope_theta=BASE, max_position_embeddings=max_pos,
                      rope_scaling=dict(scaling) if scaling else None)
    if scaling and rope_type == "longrope":
        # HF reads the original length from this attribute for longrope
        cfg.original_max_position_embeddings = ORIG
    inv_freq, attn = ROPE_INIT_FUNCTIONS[rope_type](
        cfg, device="cpu", seq_len=seq_len)
    t = torch.arange(seq_len, dtype=torch.float64)
    freqs = torch.outer(t, inv_freq.double())
    return (torch.cos(freqs) * attn).numpy(), (torch.sin(freqs) *
                                               attn).numpy()


@pytest.mark.parametrize("rope_type", list(CASES))
def test_matches_transformers(rope_type):
    scaling = CASES[rope_type]
    # max_position_embeddings as HF stores it per variant (original for
    # linear/dynamic/longrope-short, extended for yarn/llama3)
    max_pos = ORIG if rope_type in ("default", "linear", "dynamic") \
        else ORIG * 4
    cache = np.asarray(build_rope_cache(max_pos, DIM, BASE, scaling,
                                        dtype=np.float32))
    # compare over the extended range actually used at inference
    seq_len = cache.shape[0]
    hf_cos, hf_sin = _hf_table(rope_type, scaling, max_pos, seq_len)
    np.testing.assert_allclose(cache[:, :DIM // 2], hf_cos,
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(cache[:, DIM // 2:], hf_sin,
                               rtol=0, atol=5e-5)


def test_yarn_table_covers_extension():
    cache = build_rope_cache(ORIG * 4, DIM, BASE, CASES["yarn"])
    assert cache.shape[0] >= ORIG * 4
