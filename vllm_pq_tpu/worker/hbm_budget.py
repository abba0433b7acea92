"""Analytic per-device HBM budget for sharded deployments.

Role of the reference's available-memory -> num_blocks derivation
(``vllm/v1/core/kv_cache_utils.py:503-553``) turned around: given a
model + parallel mapping + resident form + KV dtype, compute what each
device must HOLD and fail loudly when it cannot fit — the check the
config-#5 dryrun runs for the 70B 2-host mapping (VERDICT r3 #6).

All terms are per-DEVICE bytes:
- resident linear weights: PP splits layers, TP splits each linear;
  bf16 = 2 B/param, int8 = 1 B/param + f32 per-out-channel scales,
  pq = 0.25 B/param codes (2x8) + codebooks;
- embed + lm_head: kept bf16, vocab-sharded over TP on the first/last
  PP stage (models/llama.py _embed / compute_logits);
- KV pool: blocks x page x 2*kvh/tp x head_dim at the cache dtype
  (+1/head f32 scale plane when int8);
- workspace headroom for XLA temps / fused-step buffers (empirically
  ~1.2 GiB at batch 256 on v5e, dominated by logits [S, vocab] f32 and
  the decode arena gather) — callers can raise it for bigger batches.
"""

from dataclasses import dataclass
from typing import Dict

# usable HBM per v5e chip (16 GiB raw minus runtime/firmware reserve)
V5E_HBM_GIB = 15.75


@dataclass
class ModelDims:
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    vocab_size: int

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def lin_params_per_layer(self) -> int:
        h, d = self.hidden_size, self.head_dim
        return (h * self.num_attention_heads * d
                + 2 * h * self.num_key_value_heads * d
                + self.num_attention_heads * d * h
                + 3 * h * self.intermediate_size)


LLAMA2_70B = ModelDims(hidden_size=8192, intermediate_size=28672,
                       num_hidden_layers=80, num_attention_heads=64,
                       num_key_value_heads=8, vocab_size=32000)


def hbm_budget(dims: ModelDims, *, tp: int = 1, pp: int = 1,
               resident_form: str = "int8", kv_cache_dtype: str = "auto",
               num_kv_blocks: int = 0, block_size: int = 16,
               workspace_gib: float = 1.3,
               hbm_gib: float = V5E_HBM_GIB) -> Dict[str, float]:
    """Per-device budget in GiB; ``fits`` is the loud bit."""
    gib = float(2 ** 30)
    layers_per_stage = -(-dims.num_hidden_layers // pp)
    lin_params = layers_per_stage * dims.lin_params_per_layer // tp

    if resident_form in ("dense", "bf16"):
        weights = lin_params * 2
    elif resident_form == "int8":
        # +f32 scale per output channel: negligible, counted anyway
        out_ch = layers_per_stage * (
            dims.num_attention_heads * dims.head_dim
            + 2 * dims.num_key_value_heads * dims.head_dim
            + dims.hidden_size + 2 * dims.intermediate_size
            + dims.hidden_size) // tp
        weights = lin_params + out_ch * 4
    elif resident_form == "pq":
        weights = lin_params // 4  # 2x8 codes; codebooks ~KBs
    else:
        raise ValueError(f"unknown resident form {resident_form!r}")

    # embed (stage 0) + lm_head (last stage) — count the worse stage,
    # vocab-sharded over TP
    embed = dims.vocab_size * dims.hidden_size * 2 // tp

    kvh_local = max(dims.num_key_value_heads // tp, 1)
    kv_elem = (1 + 4 / dims.head_dim) if kv_cache_dtype == "int8" else 2
    kv = int(num_kv_blocks * block_size * layers_per_stage * 2
             * kvh_local * dims.head_dim * kv_elem)

    total = weights + embed + kv + workspace_gib * gib
    return {
        "weights_gib": round(weights / gib, 2),
        "embed_lm_head_gib": round(embed / gib, 2),
        "kv_gib": round(kv / gib, 2),
        "workspace_gib": workspace_gib,
        "total_gib": round(total / gib, 2),
        "hbm_gib": hbm_gib,
        "fits": total <= hbm_gib * gib,
    }


def max_kv_blocks(dims: ModelDims, *, tp: int = 1, pp: int = 1,
                  resident_form: str = "int8",
                  kv_cache_dtype: str = "auto", block_size: int = 16,
                  workspace_gib: float = 1.3,
                  hbm_gib: float = V5E_HBM_GIB) -> int:
    """Largest KV pool the budget admits (0 = the weights alone don't
    fit)."""
    base = hbm_budget(dims, tp=tp, pp=pp, resident_form=resident_form,
                      kv_cache_dtype=kv_cache_dtype, num_kv_blocks=0,
                      block_size=block_size,
                      workspace_gib=workspace_gib, hbm_gib=hbm_gib)
    gib = float(2 ** 30)
    free = hbm_gib * gib - base["total_gib"] * gib
    if free <= 0:
        return 0
    layers_per_stage = -(-dims.num_hidden_layers // pp)
    kvh_local = max(dims.num_key_value_heads // tp, 1)
    kv_elem = (1 + 4 / dims.head_dim) if kv_cache_dtype == "int8" else 2
    per_block = (block_size * layers_per_stage * 2 * kvh_local
                 * dims.head_dim * kv_elem)
    return int(free // per_block)
