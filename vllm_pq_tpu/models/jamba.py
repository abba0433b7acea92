"""Jamba: hybrid attention / Mamba decoder with interleaved MoE layers
(role of reference ``models/jamba.py``, registry.py:71).

Layer i is attention iff ``i % attn_layer_period == attn_layer_offset``
(else a Mamba-1-style mixer with weighted dt/B/C RMSNorms), and carries
a routed MoE MLP iff ``i % expert_layer_period == expert_layer_offset``
(else a dense gate/up/down MLP). Attention uses NO rotary embedding
(Jamba has no explicit positional encoding).

Hybrid serving state (the new runner capability this family exercises):
``cache_kinds`` marks each layer "kv" (paged KV pages) or "ssm"
(per-row recurrent state); the runner allocates/shards/moves each kind
accordingly. Prefix caching is disabled (recurrent state is not
checkpointable per block).
"""

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.moe import FusedMoE
from vllm_pq_tpu.layers.norm import rms_norm
from vllm_pq_tpu.ops.attention import ragged_paged_attention, write_kv_cache


@dataclass
class JambaConfig:
    vocab_size: int = 65536
    hidden_size: int = 512
    intermediate_size: int = 1024
    num_hidden_layers: int = 8
    num_attention_heads: int = 8
    num_key_value_heads: int = 2
    rms_norm_eps: float = 1e-6
    attn_layer_period: int = 8
    attn_layer_offset: int = 4
    expert_layer_period: int = 2
    expert_layer_offset: int = 1
    num_experts: int = 2
    num_experts_per_tok: int = 2
    mamba_d_state: int = 16
    mamba_d_conv: int = 4
    mamba_expand: int = 2
    mamba_dt_rank: int = 32
    mamba_conv_bias: bool = True
    mamba_proj_bias: bool = False
    tie_word_embeddings: bool = False
    num_labels: int = 0     # >0: pooled classification head (reference
    #                         JambaForSequenceClassification row)
    dtype: Any = jnp.float32

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

    @property
    def mamba_d_inner(self):
        return self.mamba_expand * self.hidden_size

    def is_attn(self, li: int) -> bool:
        return li % self.attn_layer_period == self.attn_layer_offset

    def is_expert(self, li: int) -> bool:
        return (self.num_experts > 1
                and li % self.expert_layer_period
                == self.expert_layer_offset)

    @classmethod
    def from_hf_config(cls, hf) -> "JambaConfig":
        h = getattr(hf, "hidden_size", 512)
        return cls(
            vocab_size=hf.vocab_size,
            hidden_size=h,
            intermediate_size=getattr(hf, "intermediate_size", 4 * h),
            num_hidden_layers=getattr(hf, "num_hidden_layers", 8),
            num_attention_heads=getattr(hf, "num_attention_heads", 8),
            num_key_value_heads=getattr(hf, "num_key_value_heads", 2),
            rms_norm_eps=getattr(hf, "rms_norm_eps", 1e-6),
            attn_layer_period=getattr(hf, "attn_layer_period", 8),
            attn_layer_offset=getattr(hf, "attn_layer_offset", 4),
            expert_layer_period=getattr(hf, "expert_layer_period", 2),
            expert_layer_offset=getattr(hf, "expert_layer_offset", 1),
            num_experts=getattr(hf, "num_experts", 1),
            num_experts_per_tok=getattr(hf, "num_experts_per_tok", 1),
            mamba_d_state=getattr(hf, "mamba_d_state", 16),
            mamba_d_conv=getattr(hf, "mamba_d_conv", 4),
            mamba_expand=getattr(hf, "mamba_expand", 2),
            mamba_dt_rank=(getattr(hf, "mamba_dt_rank", None)
                           or (h + 15) // 16),
            mamba_conv_bias=getattr(hf, "mamba_conv_bias", True),
            mamba_proj_bias=getattr(hf, "mamba_proj_bias", False),
            tie_word_embeddings=getattr(hf, "tie_word_embeddings", False),
        )


class JambaModel:

    is_hybrid = True

    def __init__(self, cfg: JambaConfig, linear_method=None,
                 expert_parallel: bool = False):
        self.cfg = cfg
        self.linear_method = linear_method
        self.cache_kinds = ["kv" if cfg.is_attn(li) else "ssm"
                            for li in range(cfg.num_hidden_layers)]
        self.moe = FusedMoE(cfg.hidden_size, cfg.intermediate_size,
                            cfg.num_experts, cfg.num_experts_per_tok,
                            renormalize=False,
                            expert_parallel=expert_parallel)

    # -- templates ----------------------------------------------------------

    def _mamba_shapes(self) -> Dict:
        cfg = self.cfg
        dt = cfg.dtype
        i, n = cfg.mamba_d_inner, cfg.mamba_d_state
        r, k = cfg.mamba_dt_rank, cfg.mamba_d_conv
        h = cfg.hidden_size
        m = {
            "in_proj": {"weight": ((h, 2 * i), dt)},
            "conv1d": {"weight": ((i, k), dt)},
            "x_proj": {"weight": ((i, r + 2 * n), dt)},
            "dt_proj": {"weight": ((r, i), dt), "bias": ((i,), dt)},
            "dt_layernorm": {"weight": ((r,), dt)},
            "b_layernorm": {"weight": ((n,), dt)},
            "c_layernorm": {"weight": ((n,), dt)},
            "A_log": {"weight": ((i, n), dt)},
            "D": {"weight": ((i,), dt)},
            "out_proj": {"weight": ((i, h), dt)},
        }
        if cfg.mamba_conv_bias:
            m["conv1d"]["bias"] = ((i,), dt)
        if cfg.mamba_proj_bias:
            m["in_proj"]["bias"] = ((2 * i,), dt)
            m["out_proj"]["bias"] = ((h,), dt)
        return m

    def _ff_shapes(self, li: int) -> Dict:
        cfg = self.cfg
        dt = cfg.dtype
        if cfg.is_expert(li):
            return {"moe": self.moe.param_shapes(dt)}
        h, i = cfg.hidden_size, cfg.intermediate_size
        return {"mlp": {
            "gate_proj": self.linear_method.param_shapes(h, i, dt),
            "up_proj": self.linear_method.param_shapes(h, i, dt),
            "down_proj": self.linear_method.param_shapes(i, h, dt),
        }}

    def param_shapes(self) -> Dict:
        cfg = self.cfg
        dt = cfg.dtype
        h = cfg.hidden_size
        d = cfg.head_dim
        layers = []
        for li in range(cfg.num_hidden_layers):
            layer = {"input_layernorm": {"weight": ((h,), dt)},
                     "pre_ff_layernorm": {"weight": ((h,), dt)}}
            layer.update(self._ff_shapes(li))
            if cfg.is_attn(li):
                lm = self.linear_method
                layer["self_attn"] = {
                    "q_proj": lm.param_shapes(
                        h, cfg.num_attention_heads * d, dt),
                    "k_proj": lm.param_shapes(
                        h, cfg.num_key_value_heads * d, dt),
                    "v_proj": lm.param_shapes(
                        h, cfg.num_key_value_heads * d, dt),
                    "o_proj": lm.param_shapes(
                        cfg.num_attention_heads * d, h, dt),
                }
            else:
                layer["mamba"] = self._mamba_shapes()
            layers.append(layer)
        shapes = {
            "embed_tokens": {"weight": ((cfg.vocab_size, h), dt)},
            "layers": layers,
            "final_layernorm": {"weight": ((h,), dt)},
        }
        if not cfg.tie_word_embeddings:
            shapes["lm_head"] = {"weight": ((h, cfg.vocab_size), dt)}
        if cfg.num_labels:
            shapes["score"] = {"weight": ((h, cfg.num_labels), dt)}
        return shapes

    def param_specs(self) -> Dict:
        cfg = self.cfg
        lm = self.linear_method
        layers = []
        for li in range(cfg.num_hidden_layers):
            layer = {"input_layernorm": {"weight": P()},
                     "pre_ff_layernorm": {"weight": P()}}
            if cfg.is_expert(li):
                layer["moe"] = self.moe.partition_specs()
            else:
                layer["mlp"] = {
                    "gate_proj": lm.partition_specs("column"),
                    "up_proj": lm.partition_specs("column"),
                    "down_proj": lm.partition_specs("row"),
                }
            if cfg.is_attn(li):
                layer["self_attn"] = {
                    "q_proj": lm.partition_specs("column"),
                    "k_proj": lm.partition_specs("column"),
                    "v_proj": lm.partition_specs("column"),
                    "o_proj": lm.partition_specs("row"),
                }
            else:
                layer["mamba"] = jax.tree.map(
                    lambda _: P(), self._mamba_shapes(),
                    is_leaf=lambda v: isinstance(v, tuple) and len(v) == 2
                    and isinstance(v[0], tuple))
            layers.append(layer)
        specs = {
            "embed_tokens": {"weight": P()},
            "layers": layers,
            "final_layernorm": {"weight": P()},
        }
        if not cfg.tie_word_embeddings:
            specs["lm_head"] = {"weight": P()}
        if cfg.num_labels:
            specs["score"] = {"weight": P()}
        return specs

    # -- cache templates -----------------------------------------------------

    def kv_cache_shape(self, num_blocks: int, block_size: int,
                       tp_size: int = 1) -> Tuple:
        cfg = self.cfg
        return (num_blocks, block_size,
                2 * cfg.num_key_value_heads // max(tp_size, 1),
                cfg.head_dim)

    def state_shape(self, max_num_reqs: int) -> Tuple:
        cfg = self.cfg
        return (max_num_reqs, cfg.mamba_d_inner,
                cfg.mamba_d_state + cfg.mamba_d_conv)

    def kv_cache_spec(self) -> P:
        return P(None, None, None, None)

    def ssm_state_spec(self) -> P:
        return P(None, None, None)

    def rope_cache(self, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((1, 2), dtype)  # no positional encoding

    def lora_linear_defs(self):
        return []

    # -- mamba mixer (mamba-1 + weighted dt/B/C RMSNorms) --------------------

    def _mixer_step(self, mp, x, state):
        cfg = self.cfg
        n, k = cfg.mamba_d_state, cfg.mamba_d_conv
        eps = cfg.rms_norm_eps
        ssm = state[:, :, :n].astype(jnp.float32)
        conv = state[:, :, n:]

        proj = jnp.dot(x, mp["in_proj"]["weight"],
                       preferred_element_type=jnp.float32)
        if "bias" in mp["in_proj"]:
            proj = proj + mp["in_proj"]["bias"].astype(jnp.float32)
        hs, gate = jnp.split(proj.astype(x.dtype), 2, axis=-1)

        conv = jnp.concatenate(
            [conv[:, :, 1:], hs.astype(conv.dtype)[:, :, None]], axis=-1)
        u = jnp.sum(conv.astype(jnp.float32)
                    * mp["conv1d"]["weight"].astype(jnp.float32)[None],
                    axis=-1)
        if "bias" in mp["conv1d"]:
            u = u + mp["conv1d"]["bias"].astype(jnp.float32)
        u = jax.nn.silu(u)

        sp = jnp.dot(u.astype(x.dtype), mp["x_proj"]["weight"],
                     preferred_element_type=jnp.float32)
        r = cfg.mamba_dt_rank
        dt_in, b, c = sp[:, :r], sp[:, r:r + n], sp[:, r + n:]
        dt_in = rms_norm(dt_in, mp["dt_layernorm"]["weight"], eps)
        b = rms_norm(b, mp["b_layernorm"]["weight"], eps)
        c = rms_norm(c, mp["c_layernorm"]["weight"], eps)
        dt = jnp.dot(dt_in.astype(x.dtype), mp["dt_proj"]["weight"],
                     preferred_element_type=jnp.float32) \
            + mp["dt_proj"]["bias"].astype(jnp.float32)
        dt = jax.nn.softplus(dt)
        a = -jnp.exp(mp["A_log"]["weight"].astype(jnp.float32))
        da = jnp.exp(a[None] * dt[:, :, None])
        db_u = (dt[:, :, None] * b[:, None, :].astype(jnp.float32)) \
            * u[:, :, None]
        ssm = ssm * da + db_u
        y = jnp.einsum("bin,bn->bi", ssm, c.astype(jnp.float32))
        y = y + mp["D"]["weight"].astype(jnp.float32)[None] * u
        y = y * jax.nn.silu(gate.astype(jnp.float32))
        out = jnp.dot(y.astype(x.dtype), mp["out_proj"]["weight"],
                      preferred_element_type=jnp.float32)
        if "bias" in mp["out_proj"]:
            out = out + mp["out_proj"]["bias"].astype(jnp.float32)
        new_state = jnp.concatenate(
            [ssm.astype(state.dtype), conv.astype(state.dtype)], axis=-1)
        return out.astype(x.dtype), new_state

    def _mamba_layer(self, mp, x, state, positions, attn_md,
                     decode_mode: bool):
        """x [T, H] -> (y [T, H], new state [S, I, N+k])."""
        s = state.shape[0]
        t = x.shape[0]
        if decode_mode:
            xs = x[:s] if t >= s else jnp.pad(x, ((0, s - t), (0, 0)))
            reset = (positions[:s] if t >= s
                     else jnp.pad(positions, (0, s - t))) == 0
            st = jnp.where(reset[:, None, None], 0.0, state)
            y, st = self._mixer_step(mp, xs, st)
            if t > s:
                y = jnp.pad(y, ((0, t - s), (0, 0)))
            elif t < s:
                y = y[:t]
            return y, st
        cu = attn_md["cu_q_lens"]
        tok = jnp.arange(t, dtype=jnp.int32)
        seq_of_tok = jnp.sum((tok[None, :] >= cu[1:][:, None])
                             .astype(jnp.int32), axis=0)
        seq_of_tok = jnp.minimum(seq_of_tok, s - 1)

        def step(st_all, inp):
            xt, row, pos = inp
            st = st_all[row][None]
            st = jnp.where(pos == 0, jnp.zeros_like(st), st)
            y, st = self._mixer_step(mp, xt[None], st)
            st_all = st_all.at[row].set(st[0])
            return st_all, y[0]

        state, ys = jax.lax.scan(step, state,
                                 (x, seq_of_tok, positions))
        return ys, state

    def _attn_layer(self, lp, x, cache, attn_md, decode_mode,
                    decode_pages, tp_axis):
        cfg = self.cfg
        t = x.shape[0]
        d = cfg.head_dim
        hq, kvh = cfg.num_attention_heads, cfg.num_key_value_heads
        if tp_axis:
            tp = jax.lax.psum(1, tp_axis)
            hq, kvh = hq // tp, kvh // tp
        lm = self.linear_method
        q = lm.apply(lp["q_proj"], x).reshape(t, hq, d)
        k = lm.apply(lp["k_proj"], x).reshape(t, kvh, d)
        v = lm.apply(lp["v_proj"], x).reshape(t, kvh, d)
        cache = write_kv_cache(cache, k, v, attn_md["slot_mapping"])
        attn = ragged_paged_attention(
            q, cache, attn_md["kv_lens"], attn_md["page_indices"],
            attn_md["cu_q_lens"], attn_md["num_seqs"],
            sm_scale=1.0 / (d ** 0.5), decode_mode=decode_mode,
            decode_pages=decode_pages)
        o = lm.apply(lp["o_proj"], attn.reshape(t, hq * d))
        if tp_axis:
            o = jax.lax.psum(o, tp_axis)
        return o, cache

    def _ff(self, layer, li, x, tp_axis):
        cfg = self.cfg
        if cfg.is_expert(li):
            return self.moe(layer["moe"], x, tp_axis)
        lm = self.linear_method
        mp = layer["mlp"]
        g = lm.apply(mp["gate_proj"], x)
        u = lm.apply(mp["up_proj"], x)
        y = lm.apply(mp["down_proj"], jax.nn.silu(g) * u)
        if tp_axis:
            y = jax.lax.psum(y, tp_axis)
        return y

    # -- forward ------------------------------------------------------------

    def __call__(self, params, input_ids, positions, kv_caches, attn_md,
                 rope_cache, *, tp_axis=None, lora=None,
                 decode_mode: bool = False, decode_pages=None,
                 mm=None) -> Tuple[jax.Array, List[jax.Array]]:
        cfg = self.cfg
        x = params["embed_tokens"]["weight"][input_ids]
        new_caches = []
        for li, lp in enumerate(params["layers"]):
            h = rms_norm(x, lp["input_layernorm"]["weight"],
                         cfg.rms_norm_eps)
            if cfg.is_attn(li):
                y, cache = self._attn_layer(
                    lp["self_attn"], h, kv_caches[li], attn_md,
                    decode_mode, decode_pages, tp_axis)
            else:
                y, cache = self._mamba_layer(
                    lp["mamba"], h, kv_caches[li], positions, attn_md,
                    decode_mode)
            new_caches.append(cache)
            x = x + y
            h = rms_norm(x, lp["pre_ff_layernorm"]["weight"],
                         cfg.rms_norm_eps)
            x = x + self._ff(lp, li, h, tp_axis)
        x = rms_norm(x, params["final_layernorm"]["weight"],
                     cfg.rms_norm_eps)
        return x, new_caches

    def compute_logits(self, params, hidden, tp_axis=None) -> jax.Array:
        if self.cfg.tie_word_embeddings or "lm_head" not in params:
            w = params["embed_tokens"]["weight"]
            return jnp.dot(hidden, w.T,
                           preferred_element_type=jnp.float32)
        return jnp.dot(hidden, params["lm_head"]["weight"],
                       preferred_element_type=jnp.float32)

    def classify_pooled(self, params, pooled: jax.Array) -> jax.Array:
        """Pooled hidden [H] -> classification logits [num_labels]
        (reference JambaForSequenceClassification score head)."""
        return jnp.dot(pooled.astype(jnp.float32),
                       params["score"]["weight"].astype(jnp.float32))
