"""Phi-4-multimodal — role of reference
``model_executor/models/phi4mm.py`` (+ ``phi4mm_audio.py``).

Vision: SigLIP-so400m tower tapped at hidden_states[-2] (all blocks
but the last, no post-LN) → 2x2 AvgPool token compression → the Phi-3V
HD transform (2x2 spatial-to-channel merge, ``sub_GN`` newlines,
``glb_GN`` separator, order sub_glb) → 2-layer GELU projector — on the
Phi-4-mini decoder (llama math, partial rotary, fused qkv/gate_up in
checkpoints). The modality adapters ship as PEFT LoRA directories
(``vision-lora``/``speech-lora``) in the HF repo and serve through the
standard multi-LoRA path (``lora/``), exactly as the reference serves
them through its LoRA stack. The audio conformer encoder
(``phi4mm_audio.py``) is not yet implemented — audio inputs raise.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.llama import LlamaConfig
from vllm_pq_tpu.models.phi3v import Phi3VModel
from vllm_pq_tpu.quantization.methods import LinearMethod


def phi4mm_feature_span(h_crop: int, w_crop: int,
                        side2: int = 8) -> int:
    """Token span per image (sub grid + newlines + glb_GN + global)."""
    return (h_crop * side2 * (w_crop * side2 + 1) + 1
            + side2 * (side2 + 1))


class Phi4MMModel(Phi3VModel):

    def __init__(self, cfg: LlamaConfig, vision_cfg,
                 linear_method: LinearMethod,
                 image_token_index: int = 200010,
                 audio_cfg: dict = None,
                 audio_token_index: int = 200011):
        from vllm_pq_tpu.multimodal.siglip import SiglipVisionTower
        # skip Phi3VModel.__init__'s CLIP tower: rebuild with SigLIP
        super(Phi3VModel, self).__init__(cfg, linear_method)
        self.vision_cfg = vision_cfg
        self.image_token_index = image_token_index
        self.audio_token_index = audio_token_index
        self.vision_tower = SiglipVisionTower(
            vision_cfg, apply_post_layernorm=False,
            run_blocks=vision_cfg.num_hidden_layers - 1)
        self.audio_encoder = None
        if audio_cfg:
            from vllm_pq_tpu.models.phi4mm_audio import (
                ConformerConfig, Phi4MMAudioEncoder)
            self.audio_encoder = Phi4MMAudioEncoder(
                ConformerConfig.from_hf(audio_cfg), cfg.hidden_size)

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        dt = self.cfg.dtype
        # same template as Phi3V, but the tower is SigLIP
        shapes["vision"]["tower"] = self.vision_tower.param_shapes(dt)
        if self.audio_encoder is not None:
            shapes["vision"]["audio"] = \
                self.audio_encoder.param_shapes(dt)
        return shapes

    def encode_images(self, vision_params: Dict, pixels: jax.Array,
                      grid_thw: Tuple[int, int] = None) -> jax.Array:
        """pixels [num_crops+1, 3, 448, 448] (global first) + static
        (h_crop, w_crop) -> [span, text_hidden]. A 3D [1, T, n_mels]
        input is an AUDIO logfbank instead: it runs the conformer
        encoder (models/phi4mm_audio.py)."""
        if pixels.ndim == 3:
            assert self.audio_encoder is not None, \
                "audio input but no audio_processor config"
            return self.audio_encoder(vision_params["audio"],
                                      pixels[0])[None]
        h_crop, w_crop = grid_thw
        feats = self.vision_tower(vision_params["tower"], pixels)
        # 2x2 AvgPool token compression (reference phi4mm.py:398)
        n, l, c = feats.shape
        side = int(l ** 0.5)
        fx = feats.reshape(n, side // 2, 2, side // 2, 2, c)
        feats = fx.mean(axis=(2, 4)).reshape(n, (side // 2) ** 2, c)

        sub_gn = vision_params["sub_GN"]["weight"]
        glb_gn = vision_params["glb_GN"]["weight"]
        glb = self._merge_2x2(feats[0:1], 1, 1)
        glb = self._newline(glb, sub_gn)
        sub = self._merge_2x2(feats[1:1 + h_crop * w_crop], h_crop,
                              w_crop)
        sub = self._newline(sub, sub_gn)
        emb = jnp.concatenate(
            [sub, glb_gn.astype(sub.dtype)[None], glb], axis=0)
        pp = vision_params["projector"]
        y = jnp.dot(emb, pp["linear_1"]["weight"],
                    preferred_element_type=jnp.float32) \
            + pp["linear_1"]["bias"].astype(jnp.float32)
        y = jax.nn.gelu(y, approximate=False)
        y = jnp.dot(y.astype(emb.dtype), pp["linear_2"]["weight"],
                    preferred_element_type=jnp.float32) \
            + pp["linear_2"]["bias"].astype(jnp.float32)
        return y.astype(emb.dtype)
