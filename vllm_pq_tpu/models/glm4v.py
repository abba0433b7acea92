"""GLM-4V — role of reference ``model_executor/models/glm4v.py``.

Composition: EVA2-CLIP tower (conv patch embed + CLS + learned
positions, pre-norm blocks with fused biased query_key_value) → drop
CLS → 2x2 conv downsample → GLU projector (linear_proj, LayerNorm,
GELU, gate|dense_h_to_4h merged column pair, SiluAndMul,
dense_4h_to_h) → learned ``boi``/``eoi`` tokens around the span →
divide by ``scaling_factor`` — on the ChatGLM decoder. Span per image
= (side/2)^2 + 2.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.quantization.methods import LinearMethod


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)
            * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


class GLM4VModel(LlamaModel):

    def __init__(self, cfg: LlamaConfig, vision_cfg: Dict,
                 linear_method: LinearMethod,
                 image_token_index: int = 151339,
                 scaling_factor: float = 8.0):
        super().__init__(cfg, linear_method)
        self.vision_cfg = dict(vision_cfg)
        self.image_token_index = image_token_index
        self.scaling_factor = scaling_factor

    @property
    def num_image_tokens(self) -> int:
        v = self.vision_cfg
        side = v["image_size"] // v["patch_size"]
        return (side // 2) ** 2 + 2  # boi + pooled grid + eoi

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        dt = self.cfg.dtype
        v = self.vision_cfg
        vh, vi = v["hidden_size"], v["intermediate_size"]
        th = self.cfg.hidden_size
        ffn = self.cfg.intermediate_size
        n_pos = (v["image_size"] // v["patch_size"]) ** 2 + 1

        def lin(i, o, bias=True):
            d = {"weight": ((i, o), dt)}
            if bias:
                d["bias"] = ((o,), dt)
            return d

        def ln(n):
            return {"weight": ((n,), dt), "bias": ((n,), dt)}
        layer = {
            "input_layernorm": ln(vh),
            "post_attention_layernorm": ln(vh),
            "query_key_value": lin(vh, 3 * vh),
            "dense": lin(vh, vh),
            "fc1": lin(vh, vi), "fc2": lin(vi, vh),
        }
        shapes["vision"] = {
            "tower": {
                "patch_embedding": {
                    "weight": ((v["patch_size"] * v["patch_size"]
                                * v.get("in_channels", 3), vh), dt),
                    "bias": ((vh,), dt)},
                "cls_embedding": {"weight": ((vh,), dt)},
                "position_embedding": {"weight": ((n_pos, vh), dt)},
                "layers": [dict(layer)
                           for _ in range(v["num_hidden_layers"])],
            },
            # 2x2 conv downsample stored as a matmul over 2x2 blocks
            "conv": {"weight": ((2 * 2 * vh, th), dt),
                     "bias": ((th,), dt)},
            "projector": {
                "linear_proj": lin(th, th, bias=False),
                "norm1": ln(th),
                "gate_proj": lin(th, ffn, bias=False),
                "dense_h_to_4h": lin(th, ffn, bias=False),
                "dense_4h_to_h": lin(ffn, th, bias=False),
            },
            "boi": {"weight": ((th,), dt)},
            "eoi": {"weight": ((th,), dt)},
        }
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.param_shapes()["vision"],
            is_leaf=lambda v: isinstance(v, tuple))
        return specs

    def encode_images(self, vision_params: Dict, pixels: jax.Array,
                      grid_thw: Tuple = None) -> jax.Array:
        """pixels [B, 3, S, S] -> [B, (side/2)^2 + 2, text_hidden]."""
        from vllm_pq_tpu.layers.activation import ACT2FN
        v = self.vision_cfg
        tw = vision_params["tower"]
        b = pixels.shape[0]
        ps = v["patch_size"]
        side = v["image_size"] // ps
        vh = v["hidden_size"]
        act = ACT2FN[v.get("hidden_act", "gelu")]

        x = pixels.reshape(b, 3, side, ps, side, ps)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(b, side * side,
                                                  ps * ps * 3)
        x = (jnp.dot(x, tw["patch_embedding"]["weight"],
                     preferred_element_type=jnp.float32)
             + tw["patch_embedding"]["bias"].astype(jnp.float32)) \
            .astype(pixels.dtype)
        cls = jnp.broadcast_to(tw["cls_embedding"]["weight"],
                               (b, 1, vh)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + tw["position_embedding"]["weight"][None]

        heads = v["num_attention_heads"]
        hd = vh // heads
        t = x.shape[1]

        def lin(p, u):
            y = jnp.dot(u, p["weight"],
                        preferred_element_type=jnp.float32)
            if "bias" in p:
                y = y + p["bias"].astype(jnp.float32)
            return y.astype(u.dtype)

        for lp in tw["layers"]:
            h_in = _ln(x, lp["input_layernorm"])
            qkv = lin(lp["query_key_value"], h_in).reshape(
                b, t, 3, heads, hd)
            q, k, vv = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            sc = jnp.einsum("bqhd,bkhd->bhqk",
                            q.astype(jnp.float32) * (hd ** -0.5),
                            k.astype(jnp.float32))
            probs = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vv.dtype),
                             vv)
            x = x + lin(lp["dense"], ctx.reshape(b, t, vh))
            h_in = _ln(x, lp["post_attention_layernorm"])
            x = x + lin(lp["fc2"],
                        act(lin(lp["fc1"], h_in).astype(jnp.float32))
                        .astype(x.dtype))

        x = x[:, 1:]                                  # drop CLS
        s2 = side // 2
        # 2x2 conv stride 2 as a matmul over (C, kh, kw)-ordered blocks
        x = x.reshape(b, side, side, vh)
        x = x.reshape(b, s2, 2, s2, 2, vh)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, s2 * s2,
                                                  vh * 4)
        x = (jnp.dot(x, vision_params["conv"]["weight"],
                     preferred_element_type=jnp.float32)
             + vision_params["conv"]["bias"].astype(jnp.float32)) \
            .astype(pixels.dtype)

        pp = vision_params["projector"]
        x = lin(pp["linear_proj"], x)
        x = jax.nn.gelu(_ln(x, pp["norm1"]).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        gate = lin(pp["gate_proj"], x)
        up = lin(pp["dense_h_to_4h"], x)
        x = (jax.nn.silu(gate.astype(jnp.float32))
             * up.astype(jnp.float32)).astype(x.dtype)
        x = lin(pp["dense_4h_to_h"], x)
        th = x.shape[-1]
        boi = jnp.broadcast_to(vision_params["boi"]["weight"],
                               (b, 1, th)).astype(x.dtype)
        eoi = jnp.broadcast_to(vision_params["eoi"]["weight"],
                               (b, 1, th)).astype(x.dtype)
        x = jnp.concatenate([boi, x, eoi], axis=1)
        return x / self.scaling_factor
