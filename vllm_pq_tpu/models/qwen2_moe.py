"""Qwen2-MoE (Qwen1.5-MoE-A2.7B / Qwen2-57B-A14B) — role of reference
``model_executor/models/qwen2_moe.py``.

Llama/Qwen2 attention stack (GQA + qkv bias) with a per-layer choice of
dense MLP or sparse MoE: layers in ``mlp_only_layers`` (or off the
``decoder_sparse_step`` grid) stay dense; sparse layers run top-k
routed experts PLUS an always-on shared expert scaled by a per-token
sigmoid gate (reference qwen2_moe.py::Qwen2MoeSparseMoeBlock).
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.moe import FusedMoE
from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.quantization.methods import TP_AXIS, LinearMethod


@dataclass
class Qwen2MoeConfig(LlamaConfig):
    num_experts: int = 60
    num_experts_per_tok: int = 4
    moe_intermediate_size: int = 1408
    shared_expert_intermediate_size: int = 5632
    decoder_sparse_step: int = 1
    mlp_only_layers: List[int] = field(default_factory=list)
    norm_topk_prob: bool = False
    # shared-expert variants: Qwen2-MoE gates the shared expert with a
    # per-token sigmoid; GraniteMoeShared adds it ungated; Qwen3-MoE and
    # OLMoE have none (shared_expert_intermediate_size == 0)
    shared_expert_gate: bool = True

    @classmethod
    def from_hf_config(cls, hf) -> "Qwen2MoeConfig":
        base = LlamaConfig.from_hf_config(hf)
        return cls(**base.__dict__,
                   num_experts=getattr(hf, "num_experts", 60),
                   num_experts_per_tok=getattr(hf, "num_experts_per_tok", 4),
                   moe_intermediate_size=getattr(
                       hf, "moe_intermediate_size", 1408),
                   shared_expert_intermediate_size=getattr(
                       hf, "shared_expert_intermediate_size", 5632),
                   decoder_sparse_step=getattr(hf, "decoder_sparse_step", 1),
                   mlp_only_layers=list(
                       getattr(hf, "mlp_only_layers", []) or []),
                   norm_topk_prob=getattr(hf, "norm_topk_prob", False))


class Qwen2MoeModel(LlamaModel):

    def __init__(self, cfg: Qwen2MoeConfig, linear_method: LinearMethod,
                 lm_head_method: Optional[LinearMethod] = None,
                 expert_parallel: bool = False):
        super().__init__(cfg, linear_method, lm_head_method)
        self.moe = FusedMoE(cfg.hidden_size, cfg.moe_intermediate_size,
                            cfg.num_experts, cfg.num_experts_per_tok,
                            renormalize=cfg.norm_topk_prob,
                            expert_parallel=expert_parallel)

    def is_sparse(self, li: int) -> bool:
        cfg = self.cfg
        return (li not in cfg.mlp_only_layers
                and cfg.num_experts > 0
                and (li + 1) % cfg.decoder_sparse_step == 0)

    def _attn_linear_defs(self):
        from vllm_pq_tpu.models.llama import _linear_defs
        return [d for d in _linear_defs(self.cfg)
                if d[0] in ("q_proj", "k_proj", "v_proj", "o_proj")]

    def _dense_linear_defs(self):
        from vllm_pq_tpu.models.llama import _linear_defs
        return [d for d in _linear_defs(self.cfg)
                if d[0] in ("gate_proj", "up_proj", "down_proj")]

    def lora_linear_defs(self):
        return self._attn_linear_defs()

    def param_shapes(self) -> Dict:
        cfg = self.cfg
        dt = cfg.dtype
        layers = []
        for li in range(cfg.num_hidden_layers):
            lp: Dict = {}
            for name, i, o, _k in self._attn_linear_defs():
                lp[name] = self.linear_method.param_shapes(i, o, dt)
                if cfg.attention_bias and name != "o_proj":
                    lp[name + "_bias"] = {"bias": ((o,), dt)}
            if cfg.qk_norm == "head":   # Qwen3-MoE
                lp["q_norm"] = {"weight": ((cfg.head_dim,), dt)}
                lp["k_norm"] = {"weight": ((cfg.head_dim,), dt)}
            elif cfg.qk_norm == "full":  # OLMoE
                d = cfg.head_dim
                lp["q_norm"] = {
                    "weight": ((cfg.num_attention_heads * d,), dt)}
                lp["k_norm"] = {
                    "weight": ((cfg.num_key_value_heads * d,), dt)}
            if self.is_sparse(li):
                lp["moe"] = self.moe.param_shapes(dt)
                si = cfg.shared_expert_intermediate_size
                h = cfg.hidden_size
                if si:
                    lp["shared_gate_proj"] = {"weight": ((h, si), dt)}
                    lp["shared_up_proj"] = {"weight": ((h, si), dt)}
                    lp["shared_down_proj"] = {"weight": ((si, h), dt)}
                    if cfg.shared_expert_gate:
                        lp["shared_expert_gate"] = {"weight": ((h, 1),
                                                               dt)}
            else:
                for name, i, o, _k in self._dense_linear_defs():
                    lp[name] = self.linear_method.param_shapes(i, o, dt)
            lp["input_layernorm"] = {"weight": ((cfg.hidden_size,), dt)}
            lp["post_attention_layernorm"] = {
                "weight": ((cfg.hidden_size,), dt)}
            layers.append(lp)
        shapes = {
            "embed_tokens": {"weight": ((cfg.vocab_size, cfg.hidden_size),
                                        dt)},
            "layers": layers,
            "norm": {"weight": ((cfg.hidden_size,), dt)},
        }
        if not cfg.tie_word_embeddings:
            shapes["lm_head"] = self.lm_head_method.param_shapes(
                cfg.hidden_size, cfg.vocab_size, dt)
        return shapes

    def param_specs(self) -> Dict:
        cfg = self.cfg
        layers = []
        for li in range(cfg.num_hidden_layers):
            lp: Dict = {}
            for name, _i, _o, kind in self._attn_linear_defs():
                lp[name] = self.linear_method.partition_specs(kind)
                if cfg.attention_bias and name != "o_proj":
                    lp[name + "_bias"] = {"bias": P(TP_AXIS)}
            if cfg.qk_norm == "head":
                lp["q_norm"] = {"weight": P(None)}
                lp["k_norm"] = {"weight": P(None)}
            elif cfg.qk_norm == "full":
                lp["q_norm"] = {"weight": P(TP_AXIS)}
                lp["k_norm"] = {"weight": P(TP_AXIS)}
            if self.is_sparse(li):
                lp["moe"] = self.moe.partition_specs()
                if cfg.shared_expert_intermediate_size:
                    lp["shared_gate_proj"] = {"weight": P(None, TP_AXIS)}
                    lp["shared_up_proj"] = {"weight": P(None, TP_AXIS)}
                    lp["shared_down_proj"] = {"weight": P(TP_AXIS, None)}
                    if cfg.shared_expert_gate:
                        lp["shared_expert_gate"] = {
                            "weight": P(None, None)}
            else:
                for name, _i, _o, kind in self._dense_linear_defs():
                    lp[name] = self.linear_method.partition_specs(kind)
            lp["input_layernorm"] = {"weight": P(None)}
            lp["post_attention_layernorm"] = {"weight": P(None)}
            layers.append(lp)
        specs = {
            "embed_tokens": {"weight": P(TP_AXIS, None)},
            "layers": layers,
            "norm": {"weight": P(None)},
        }
        if not cfg.tie_word_embeddings:
            specs["lm_head"] = self.lm_head_method.partition_specs("column")
        return specs

    def _mlp(self, lp: Dict, h: jax.Array, tp_axis: Optional[str],
             lora_layer: Optional[Dict] = None,
             lora_md: Optional[Dict] = None) -> jax.Array:
        if "moe" not in lp:
            return super()._mlp(lp, h, tp_axis, lora_layer, lora_md)
        out = self.moe(lp["moe"], h, tp_axis)
        if "shared_gate_proj" not in lp:
            return out
        # shared expert: dense SwiGLU, scaled by a per-token sigmoid
        # gate (Qwen2-MoE) or added ungated (GraniteMoeShared)
        mm = lambda n, x: jnp.dot(  # noqa: E731
            x, lp[n]["weight"],
            preferred_element_type=jnp.float32).astype(x.dtype)
        sh = mm("shared_down_proj",
                jax.nn.silu(mm("shared_gate_proj", h))
                * mm("shared_up_proj", h))
        if tp_axis:
            sh = jax.lax.psum(sh, tp_axis)
        if "shared_expert_gate" not in lp:
            return out + sh
        g = jax.nn.sigmoid(jnp.dot(
            h, lp["shared_expert_gate"]["weight"],
            preferred_element_type=jnp.float32))  # [T, 1]
        return out + g.astype(out.dtype) * sh
