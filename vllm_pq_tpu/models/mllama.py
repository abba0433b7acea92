"""Mllama (Llama-3.2-Vision) — role of reference
``model_executor/models/mllama.py``.

Composition:
- a two-stage tiled vision encoder (local transformer collecting
  intermediate states + tanh-gated global transformer, tile/aspect
  embeddings; reference MllamaVisionModel, mllama.py:595) whose output
  is projected to the text width and cached per request,
- a llama text decoder whose layers at ``cross_attention_layers``
  cross-attend to the cached vision states with per-head q/k RMS norms
  and tanh-gated residuals (reference
  MllamaCrossAttentionDecoderLayer, mllama.py:959).

Runtime: reuses the encoder-decoder plumbing built for Whisper — the
encoder runs ONCE per request; its states ride into every step as
``enc_states``/``enc_lens``; ``enc_pos`` carries the image-token
position so text rows before the image mask the whole cross branch
(the reference's full_text_row_masked_out_mask semantics).

Quantization/TP note: self-attention layers use the configured
LinearMethod and TP partitioning; the cross layers' projections stay
replicated bf16 (8 of 40 layers on the real model) — follow-up work.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.norm import layer_norm, rms_norm
from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.quantization.methods import LinearMethod


@dataclass
class MllamaVisionCfg:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_global_layers: int = 8
    attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    num_channels: int = 3
    max_num_tiles: int = 4
    max_aspect_ratio_id: int = 8
    intermediate_layers_indices: tuple = (3, 7, 15, 23, 30)
    norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    @property
    def output_dim(self) -> int:
        return self.hidden_size * (
            1 + len(self.intermediate_layers_indices))


@dataclass
class MllamaConfig(LlamaConfig):
    cross_attention_layers: tuple = (3, 8, 13, 18, 23, 28, 33, 38)
    vision: MllamaVisionCfg = field(default_factory=MllamaVisionCfg)

    @property
    def d_model(self) -> int:  # enc-dec runner buffer width
        return self.hidden_size


def _lnb(n, dt):
    return {"weight": ((n,), dt), "bias": ((n,), dt)}


def _lin_shape(i, o, dt, bias=False):
    d = {"weight": ((i, o), dt)}
    if bias:
        d["bias"] = ((o,), dt)
    return d


class MllamaModel(LlamaModel):

    is_encoder_decoder = True

    def __init__(self, cfg: MllamaConfig, linear_method: LinearMethod,
                 lm_head_method: Optional[LinearMethod] = None):
        super().__init__(cfg, linear_method, lm_head_method)
        self.cross_set = set(cfg.cross_attention_layers)

    # -- parameter templates --------------------------------------------

    def _cross_layer_shapes(self, dt) -> Dict:
        cfg = self.cfg
        h, d = cfg.hidden_size, cfg.head_dim
        nq = cfg.num_attention_heads * d
        nkv = cfg.num_key_value_heads * d
        return {
            "q_proj": _lin_shape(h, nq, dt),
            "k_proj": _lin_shape(h, nkv, dt),
            "v_proj": _lin_shape(h, nkv, dt),
            "o_proj": _lin_shape(nq, h, dt),
            "q_norm": {"weight": ((d,), dt)},
            "k_norm": {"weight": ((d,), dt)},
            "attn_gate": {"weight": ((1,), dt)},
            "mlp_gate": {"weight": ((1,), dt)},
            "input_layernorm": {"weight": ((h,), dt)},
            "post_attention_layernorm": {"weight": ((h,), dt)},
            "gate_proj": _lin_shape(h, cfg.intermediate_size, dt),
            "up_proj": _lin_shape(h, cfg.intermediate_size, dt),
            "down_proj": _lin_shape(cfg.intermediate_size, h, dt),
        }

    def _vision_shapes(self, dt) -> Dict:
        v = self.cfg.vision
        hv, iv = v.hidden_size, v.intermediate_size
        npch = v.num_patches
        layer = {
            "input_layernorm": _lnb(hv, dt),
            "post_attention_layernorm": _lnb(hv, dt),
            "q_proj": _lin_shape(hv, hv, dt),
            "k_proj": _lin_shape(hv, hv, dt),
            "v_proj": _lin_shape(hv, hv, dt),
            "o_proj": _lin_shape(hv, hv, dt),
            "fc1": _lin_shape(hv, iv, dt, bias=True),
            "fc2": _lin_shape(iv, hv, dt, bias=True),
        }
        glayer = dict(layer)
        glayer["gate_attn"] = {"weight": ((1,), dt)}
        glayer["gate_ffn"] = {"weight": ((1,), dt)}
        ar = v.max_aspect_ratio_id + 1
        return {
            "patch_embedding": {"weight": (
                (v.patch_size * v.patch_size * v.num_channels, hv), dt)},
            "class_embedding": {"weight": ((hv,), dt)},
            "gated_positional_embedding": {
                "embedding": ((npch, hv), dt),
                "gate": ((1,), dt),
                "tile_embedding": ((ar, v.max_num_tiles * npch * hv), dt),
            },
            "pre_tile_positional_embedding": {
                "embedding": ((ar, v.max_num_tiles * hv), dt),
                "gate": ((1,), dt)},
            "post_tile_positional_embedding": {
                "embedding": ((ar, v.max_num_tiles * hv), dt),
                "gate": ((1,), dt)},
            "layernorm_pre": _lnb(hv, dt),
            "layernorm_post": _lnb(hv, dt),
            "layers": [dict(layer) for _ in range(v.num_hidden_layers)],
            "global_layers": [dict(glayer)
                              for _ in range(v.num_global_layers)],
            "projector": _lin_shape(v.output_dim, self.cfg.hidden_size,
                                    dt, bias=True),
        }

    def param_shapes(self) -> Dict:
        cfg = self.cfg
        dt = cfg.dtype
        shapes = super().param_shapes()
        # the image token lives past the text vocab (reference
        # mllama.py:1037 embed rows = vocab_size + 8)
        shapes["embed_tokens"] = {
            "weight": ((cfg.vocab_size + 8, cfg.hidden_size), dt)}
        for li in self.cross_set:
            shapes["layers"][li] = self._cross_layer_shapes(dt)
        shapes["vision"] = self._vision_shapes(dt)
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        rep = jax.tree.map(lambda _: P(), self.param_shapes(),
                           is_leaf=lambda v: isinstance(v, tuple)
                           and len(v) == 2 and isinstance(v[0], tuple))
        specs["embed_tokens"] = {"weight": P(None, None)}
        for li in self.cross_set:
            specs["layers"][li] = rep["layers"][li]
        specs["vision"] = rep["vision"]
        return specs

    # -- vision encoder (runs once per request) --------------------------

    def encode_encoder_input(self, params: Dict,
                             pixels: jax.Array) -> jax.Array:
        """pixels [tiles, 3, H, W] (single image; aspect ratio 1x1 when
        tiles == 1) -> cross-attention states [tiles*num_patches,
        text_hidden]."""
        v = self.cfg.vision
        vp = params["vision"]
        eps = v.norm_eps
        if pixels.ndim == 3:
            pixels = pixels[None]
        tiles = pixels.shape[0]
        ps = v.patch_size
        g = v.image_size // ps
        hv = v.hidden_size
        npch = v.num_patches           # per tile, incl. CLS
        ar_id = 1                      # single-image 1x1 tiling

        x = pixels.reshape(tiles, v.num_channels, g, ps, g, ps)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(
            tiles, g * g, ps * ps * v.num_channels)
        x = jnp.dot(x, vp["patch_embedding"]["weight"],
                    preferred_element_type=jnp.float32).astype(
            pixels.dtype)

        # pre-tile embedding (gated), applied before the CLS token
        pre = vp["pre_tile_positional_embedding"]
        emb = pre["embedding"][ar_id].reshape(v.max_num_tiles, 1, hv)
        x = x + (jnp.tanh(pre["gate"][0]) * emb)[:tiles]

        cls = jnp.broadcast_to(vp["class_embedding"]["weight"],
                               (tiles, 1, hv)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)     # [tiles, npch, hv]

        gp = vp["gated_positional_embedding"]
        gate = jnp.tanh(gp["gate"][0])
        x = x + (1.0 - gate) * gp["embedding"][None]
        tile_pos = gp["tile_embedding"][ar_id].reshape(
            v.max_num_tiles, npch, hv)
        x = x + gate * tile_pos[:tiles]

        x = layer_norm(x, vp["layernorm_pre"]["weight"],
                       vp["layernorm_pre"]["bias"], eps)

        # pad the patch axis to a multiple of 8 (HF kernel alignment —
        # kept for numerical parity of the padded-key masking)
        pad = (8 - npch % 8) % 8
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        pl = npch + pad
        x = x.reshape(1, tiles * pl, hv)
        key_ok = (jnp.arange(pl) < npch)
        key_ok = jnp.tile(key_ok, tiles)          # [tiles*pl]

        inter = []
        for i, lp in enumerate(params["vision"]["layers"]):
            if i in v.intermediate_layers_indices:
                inter.append(x)
            x = self._vision_block(lp, x, key_ok, eps, gated=False)
        # HF collects hidden_states BEFORE each layer and appends the
        # final output; intermediate_layers_indices index that list
        x_final = x
        for i in v.intermediate_layers_indices:
            if i == v.num_hidden_layers:
                inter.append(x_final)

        x = layer_norm(x, vp["layernorm_post"]["weight"],
                       vp["layernorm_post"]["bias"], eps)
        post = vp["post_tile_positional_embedding"]
        emb = post["embedding"][ar_id].reshape(v.max_num_tiles, 1, hv)
        x = x.reshape(tiles, pl, hv)
        x = x + (jnp.tanh(post["gate"][0]) * emb)[:tiles]
        x = x.reshape(1, tiles * pl, hv)
        for lp in params["vision"]["global_layers"]:
            x = self._vision_block(lp, x, key_ok, eps, gated=True)

        # strip padding, concat intermediates, project to text width.
        # HF stacks intermediates on a trailing axis then flattens
        # (mllama.py:729): inter_flat[.., h*n + j] = inter_j[.., h]
        def unpad(u):
            return u.reshape(tiles, pl, hv)[:, :npch]
        inter_flat = jnp.stack([unpad(u) for u in inter],
                               axis=-1).reshape(tiles, npch, -1)
        feats = jnp.concatenate([unpad(x), inter_flat],
                                axis=-1)          # [tiles, npch, out]
        pj = vp["projector"]
        out = (jnp.dot(feats, pj["weight"],
                       preferred_element_type=jnp.float32)
               + pj["bias"].astype(jnp.float32))
        return out.reshape(tiles * npch,
                           self.cfg.hidden_size).astype(self.cfg.dtype)

    def _vision_block(self, lp, x, key_ok, eps, *, gated):
        v = self.cfg.vision
        nh = v.attention_heads
        b, t, hv = x.shape
        d = hv // nh
        scale = d ** -0.5

        def mm(n, u):
            y = jnp.dot(u, lp[n]["weight"],
                        preferred_element_type=jnp.float32)
            if "bias" in lp[n]:
                y = y + lp[n]["bias"].astype(jnp.float32)
            return y.astype(u.dtype)

        h = layer_norm(x, lp["input_layernorm"]["weight"],
                       lp["input_layernorm"]["bias"], eps)
        q = mm("q_proj", h).reshape(b, t, nh, d)
        k = mm("k_proj", h).reshape(b, t, nh, d)
        vv = mm("v_proj", h).reshape(b, t, nh, d)
        sc = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
        sc = jnp.where(key_ok[None, None, None, :], sc, -1e30)
        probs = jax.nn.softmax(sc, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vv.dtype), vv)
        ga = jnp.tanh(lp["gate_attn"]["weight"][0]) if gated else 1.0
        x = x + ga * mm("o_proj", attn.reshape(b, t, hv))

        h = layer_norm(x, lp["post_attention_layernorm"]["weight"],
                       lp["post_attention_layernorm"]["bias"], eps)
        f = jax.nn.gelu(mm("fc1", h).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        gf = jnp.tanh(lp["gate_ffn"]["weight"][0]) if gated else 1.0
        return x + gf * mm("fc2", f)

    # -- text decoder -----------------------------------------------------

    def __call__(self, params, input_ids, positions, kv_caches, attn_md,
                 rope_cache, *, tp_axis=None, lora=None,
                 decode_mode: bool = False, decode_pages=None,
                 mm=None) -> Tuple[jax.Array, List[jax.Array]]:
        cfg = self.cfg
        tp = jax.lax.psum(1, tp_axis) if tp_axis else 1
        heads = cfg.num_attention_heads // tp
        kv_heads = cfg.num_key_value_heads // tp
        d = cfg.head_dim
        sm_scale = 1.0 / (d ** 0.5)
        norm = self.make_norm()
        t = input_ids.shape[0]

        enc_states = attn_md["enc_states"]    # [S, L_enc, H]
        enc_lens = attn_md["enc_lens"]        # i32[S]
        enc_pos = attn_md.get("enc_pos")      # i32[S] image-token pos
        s, l_enc, _ = enc_states.shape
        cu = attn_md["cu_q_lens"]
        tok = jnp.arange(t, dtype=jnp.int32)
        seq_of_tok = jnp.sum((tok[None, :] >= cu[1:][:, None])
                             .astype(jnp.int32), axis=0)
        seq_of_tok = jnp.minimum(seq_of_tok, s - 1)
        if decode_mode:
            seq_of_tok = jnp.minimum(tok, s - 1)
        # the reference's full_text_row_masked_out_mask: a text row
        # participates in cross layers iff it sits at/after the image
        # token and the row has an image at all
        row_img_pos = (enc_pos[seq_of_tok] if enc_pos is not None
                       else jnp.zeros(t, jnp.int32))
        row_visible = ((enc_lens[seq_of_tok] > 0)
                       & (positions >= row_img_pos))  # [T]

        x = self._embed(params["embed_tokens"], input_ids, None)
        enc_tok = enc_states[seq_of_tok]      # [T, L_enc, H]
        key_ok = (jnp.arange(l_enc)[None, :]
                  < enc_lens[seq_of_tok][:, None])

        new_caches = []
        for li in range(cfg.num_hidden_layers):
            lp = params["layers"][li]
            if li in self.cross_set:
                x = self._cross_layer(lp, x, enc_tok, key_ok,
                                      row_visible, norm)
                new_caches.append(kv_caches[li])  # untouched
                continue
            x, cache = self.decoder_layer(
                lp, li, x, positions, kv_caches[li], attn_md, rope_cache,
                tp_axis=tp_axis, lora_layer=None, lora_md=None,
                decode_mode=decode_mode, decode_pages=decode_pages,
                norm=norm, heads=heads, kv_heads=kv_heads,
                sm_scale=sm_scale)
            new_caches.append(cache)
        x = norm(x, params["norm"])
        return x, new_caches

    def _cross_layer(self, lp, x, enc_tok, key_ok, row_visible, norm):
        cfg = self.cfg
        d = cfg.head_dim
        hq = cfg.num_attention_heads
        kvh = cfg.num_key_value_heads
        rep = hq // kvh
        t, l_enc, _ = enc_tok.shape
        scale = d ** -0.5

        def mm(n, u):
            return jnp.dot(u, lp[n]["weight"],
                           preferred_element_type=jnp.float32).astype(
                u.dtype)

        h = norm(x, lp["input_layernorm"])
        q = mm("q_proj", h).reshape(t, hq, d)
        q = rms_norm(q, lp["q_norm"]["weight"], cfg.rms_norm_eps)
        k = mm("k_proj", enc_tok).reshape(t, l_enc, kvh, d)
        k = rms_norm(k, lp["k_norm"]["weight"], cfg.rms_norm_eps)
        v = mm("v_proj", enc_tok).reshape(t, l_enc, kvh, d)
        qg = q.reshape(t, kvh, rep, d)
        sc = jnp.einsum("tkrd,tlkd->tkrl", qg.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
        sc = jnp.where(key_ok[:, None, None, :], sc, -1e30)
        probs = jax.nn.softmax(sc, axis=-1)
        attn = jnp.einsum("tkrl,tlkd->tkrd", probs.astype(v.dtype), v)
        out = mm("o_proj", attn.reshape(t, hq * d))
        out = jnp.where(row_visible[:, None], out, 0)
        x = x + jnp.tanh(lp["attn_gate"]["weight"][0].astype(
            jnp.float32)).astype(x.dtype) * out

        h = norm(x, lp["post_attention_layernorm"])
        f = (jax.nn.silu(mm("gate_proj", h).astype(jnp.float32))
             * mm("up_proj", h).astype(jnp.float32)).astype(x.dtype)
        f = mm("down_proj", f)
        f = jnp.where(row_visible[:, None], f, 0)
        return x + jnp.tanh(lp["mlp_gate"]["weight"][0].astype(
            jnp.float32)).astype(x.dtype) * f

    def compute_logits(self, params: Dict, hidden: jax.Array,
                       tp_axis=None) -> jax.Array:
        logits = self.lm_head_method.apply(
            params["lm_head"], hidden).astype(jnp.float32)
        if tp_axis:
            logits = jax.lax.all_gather(logits, tp_axis, axis=1,
                                        tiled=True)
        return logits.astype(jnp.float32)
