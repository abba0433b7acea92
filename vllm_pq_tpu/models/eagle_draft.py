"""EAGLE / DeepSeek-MTP hidden-state-conditioned draft models.

Role of the reference's EAGLE draft model
(``vllm/model_executor/models/eagle.py:44``) and DeepSeek multi-token
predictor (``deepseek_mtp.py``): a 1-to-few-layer decoder whose input at
position p is a projection of ``concat(embed(x_{p+1}), f_p)`` where
``f_p`` is the TARGET model's last hidden state at position p. The draft
autoregresses through its own layer stack (own paged KV cache) to
propose K tokens; the target verifies them through the standard
rejection path (``layers/rejection.py``).

Behavioral contract mirrored from the reference:
- EAGLE (``eagle.py:85-92``): fc [2h -> h] (optional bias), the FIRST
  decoder layer's input_layernorm is bypassed, the final norm is
  bypassed, inputs at position 0 are zeroed after the fc
  (``eagle.py:134``). lm_head comes from the draft checkpoint when
  present, else is injected from the target at proposer init.
- MTP (``deepseek_mtp.py:59-91``): enorm/hnorm RMS-normalize the token
  embedding and the previous hidden state separately, eh_proj [2h -> h]
  combines them, one decoder block follows, and a SharedHead norm is
  applied before the (shared) lm head.

TPU-native framing: the draft is an ordinary jitted model on the same
mesh; the hidden-state conditioning rides the step inputs as a device
array (``hidden_cond``) exactly like multimodal embeddings do, so the
proposer never pulls hidden states to the host.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_pq_tpu.models.llama import TP_AXIS, LlamaConfig, LlamaModel


class EagleDraftModel(LlamaModel):
    """EAGLE-style draft: fc-conditioned 1+ layer llama decoder."""

    needs_hidden_cond = True
    identity_input_norm_layers = frozenset([0])

    def __init__(self, cfg: LlamaConfig, linear_method,
                 lm_head_method=None, *, style: str = "eagle",
                 fc_bias: bool = False):
        super().__init__(cfg, linear_method, lm_head_method)
        assert style in ("eagle", "mtp")
        self.style = style
        self.fc_bias = fc_bias
        if style == "mtp":
            # MTP keeps the standard input norm on its block
            self.identity_input_norm_layers = frozenset()

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        h = self.cfg.hidden_size
        dt = self.cfg.dtype
        fc: Dict[str, Tuple] = {"weight": ((2 * h, h), dt)}
        if self.fc_bias:
            fc["bias"] = ((h,), dt)
        shapes["fc"] = fc
        if self.style == "mtp":
            shapes["enorm"] = self._norm_shape()
            shapes["hnorm"] = self._norm_shape()
            shapes["head_norm"] = self._norm_shape()
        return shapes

    def param_specs(self) -> Dict:
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs()
        specs["fc"] = {k: P(None, None) if k == "weight" else P(None)
                       for k in self.param_shapes()["fc"]}
        if self.style == "mtp":
            norm_spec = {k: P(None) for k in self._norm_shape()}
            specs["enorm"] = dict(norm_spec)
            specs["hnorm"] = dict(norm_spec)
            specs["head_norm"] = dict(norm_spec)
        return specs

    def __call__(self, params, input_ids, positions, kv_caches, attn_md,
                 rope_cache, *, tp_axis: Optional[str] = TP_AXIS,
                 lora=None, decode_mode: bool = False,
                 decode_pages: Optional[int] = None, mm=None):
        cfg = self.cfg
        tp = jax.lax.psum(1, tp_axis) if tp_axis else 1
        heads = cfg.num_attention_heads // tp
        kv_heads = cfg.num_key_value_heads // tp
        d = cfg.head_dim
        sm_scale = 1.0 / (d ** 0.5)
        norm = self.make_norm()

        emb = self._embed(params["embed_tokens"], input_ids, tp_axis)
        hc = attn_md["hidden_cond"].astype(emb.dtype)
        if self.style == "mtp":
            emb = norm(emb, params["enorm"])
            hc = norm(hc, params["hnorm"])
        x = jnp.dot(jnp.concatenate([emb, hc], axis=-1),
                    params["fc"]["weight"],
                    preferred_element_type=jnp.float32).astype(emb.dtype)
        if "bias" in params["fc"]:
            x = x + params["fc"]["bias"]
        # position 0 has no previous target hidden: zero its input
        # (reference eagle.py:134 / deepseek_mtp.py:80)
        x = jnp.where((positions == 0)[:, None], 0.0, x)

        new_caches: List[jax.Array] = []
        for li in range(cfg.num_hidden_layers):
            x, cache = self.decoder_layer(
                params["layers"][li], li, x, positions, kv_caches[li],
                attn_md, rope_cache, tp_axis=tp_axis, lora_layer=None,
                lora_md=None, decode_mode=decode_mode,
                decode_pages=decode_pages, norm=norm, heads=heads,
                kv_heads=kv_heads, sm_scale=sm_scale)
            new_caches.append(cache)
        # EAGLE: NO final norm — the hidden feeds the lm head (and the
        # next draft step's conditioning) raw. MTP: SharedHead norm.
        if self.style == "mtp":
            x = norm(x, params["head_norm"])
        return x, new_caches
