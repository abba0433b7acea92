"""Mixtral (sparse MoE Llama) — role of reference
``model_executor/models/mixtral.py``. Attention stack is inherited from
the Llama decoder; the dense MLP is replaced by a routed FusedMoE block
(``layers/moe.py``). Qwen2-MoE/DeepSeek-style shared experts are not in
scope yet.
"""

from dataclasses import dataclass
from typing import Dict, Optional

import jax
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.moe import FusedMoE
from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel, _linear_defs
from vllm_pq_tpu.quantization.methods import LinearMethod


@dataclass
class MixtralConfig(LlamaConfig):
    num_local_experts: int = 8
    num_experts_per_tok: int = 2
    moe_act: str = "silu"                  # Grok1: gelu experts
    router_logit_cap: Optional[float] = None  # Grok1: 30*tanh(x/30)

    @classmethod
    def from_hf_config(cls, hf) -> "MixtralConfig":
        base = LlamaConfig.from_hf_config(hf)
        return cls(**base.__dict__,
                   num_local_experts=getattr(hf, "num_local_experts", 8),
                   num_experts_per_tok=getattr(hf, "num_experts_per_tok", 2))


class MixtralModel(LlamaModel):

    def __init__(self, cfg: MixtralConfig, linear_method: LinearMethod,
                 lm_head_method: Optional[LinearMethod] = None,
                 expert_parallel: bool = False):
        super().__init__(cfg, linear_method, lm_head_method)
        self.moe = FusedMoE(cfg.hidden_size, cfg.intermediate_size,
                            cfg.num_local_experts, cfg.num_experts_per_tok,
                            expert_parallel=expert_parallel,
                            act=getattr(cfg, "moe_act", "silu"),
                            router_logit_cap=getattr(
                                cfg, "router_logit_cap", None))

    # attention projections stay (possibly quantized) linears; the MoE
    # block is bf16 for now (quantized MoE is follow-up work, reference
    # marlin_moe / moe_wna16 analogs)
    def _attn_linear_defs(self):
        return [d for d in _linear_defs(self.cfg)
                if d[0] in ("q_proj", "k_proj", "v_proj", "o_proj")]

    def param_shapes(self) -> Dict:
        cfg = self.cfg
        layer = {}
        for name, i, o, _kind in self._attn_linear_defs():
            layer[name] = self.linear_method.param_shapes(i, o, cfg.dtype)
            if cfg.attention_bias and name in ("q_proj", "k_proj", "v_proj"):
                layer[name + "_bias"] = {"bias": ((o,), cfg.dtype)}
        if cfg.o_proj_bias:
            layer["o_proj_bias"] = {"bias": ((cfg.hidden_size,),
                                             cfg.dtype)}
        layer["moe"] = self.moe.param_shapes(cfg.dtype)
        # norm shapes honor the base-config knobs (DBRX: bias-free
        # layernorm; Phi-MoE: biased layernorm; Grok1: 4-norm
        # use_post_norms layout)
        for n in self._norm_names():
            layer[n] = self._norm_shape()
        shapes = {
            "embed_tokens": {"weight": ((cfg.vocab_size, cfg.hidden_size),
                                        cfg.dtype)},
            "layers": [dict(layer) for _ in range(cfg.num_hidden_layers)],
            "norm": self._norm_shape(),
        }
        if not cfg.tie_word_embeddings:
            shapes["lm_head"] = self.lm_head_method.param_shapes(
                cfg.hidden_size, cfg.vocab_size, cfg.dtype)
            if cfg.lm_head_bias:
                shapes["lm_head_bias"] = {"bias": ((cfg.vocab_size,),
                                                   cfg.dtype)}
        return shapes

    def param_specs(self) -> Dict:
        cfg = self.cfg
        layer = {}
        for name, _i, _o, kind in self._attn_linear_defs():
            layer[name] = self.linear_method.partition_specs(kind)
            if cfg.attention_bias and name in ("q_proj", "k_proj", "v_proj"):
                from vllm_pq_tpu.quantization.methods import TP_AXIS
                layer[name + "_bias"] = {"bias": P(TP_AXIS)}
        if cfg.o_proj_bias:
            layer["o_proj_bias"] = {"bias": P(None)}
        layer["moe"] = self.moe.partition_specs()
        norm_spec = {k: P(None) for k in self._norm_shape()}
        for n in self._norm_names():
            layer[n] = dict(norm_spec)
        from vllm_pq_tpu.quantization.methods import TP_AXIS
        specs = {
            "embed_tokens": {"weight": P(TP_AXIS, None)},
            "layers": [dict(layer) for _ in range(cfg.num_hidden_layers)],
            "norm": dict(norm_spec),
        }
        if not cfg.tie_word_embeddings:
            specs["lm_head"] = self.lm_head_method.partition_specs("column")
            if cfg.lm_head_bias:
                specs["lm_head_bias"] = {"bias": P(None)}
        return specs

    def lora_linear_defs(self):
        return self._attn_linear_defs()

    def _mlp(self, lp: Dict, h: jax.Array, tp_axis: Optional[str],
             lora_layer: Optional[Dict] = None,
             lora_md: Optional[Dict] = None) -> jax.Array:
        # LoRA on MoE expert weights is out of scope (attention-side
        # LoRA still applies via the inherited _lin path)
        return self.moe(lp["moe"], h, tp_axis)
