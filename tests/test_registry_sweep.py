"""Registry resolution sweep (VERDICT r4 #9): every registered arch
name must build a model object with a coherent parameter template from
a synthetic config. This is the test that catches wrong-architecture
fallthrough, missing config aliases, and sharding/shape template breaks
across the whole registry (the round-4 Qwen2.5-VL and InternVL alias
breaks were both this class of bug)."""

import numpy as np
import pytest


def _tiny_text(**over):
    d = dict(architectures=None, model_type="llama",
             vocab_size=128, hidden_size=32, intermediate_size=64,
             num_hidden_layers=2, num_attention_heads=2,
             num_key_value_heads=2, head_dim=16,
             rms_norm_eps=1e-5, layer_norm_eps=1e-5,
             layer_norm_epsilon=1e-5, rope_theta=10000.0,
             max_position_embeddings=128, tie_word_embeddings=False,
             hidden_act="silu", num_labels=2,
             id2label={0: "a", 1: "b"})
    d.update(over)
    return d


_VISION = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
               num_attention_heads=2, image_size=16, patch_size=4,
               num_channels=3, depth=2, embed_dim=32, num_heads=2,
               mlp_ratio=2.0, in_channels=3, in_chans=3,
               temporal_patch_size=2, spatial_merge_size=2,
               window_size=8, fullatt_block_indexes=[1],
               hidden_act="quick_gelu", projection_dim=16,
               out_hidden_size=32, rope_theta=10000.0, head_dim=16,
               model_type="clip_vision_model")

_AUDIO = dict(d_model=32, encoder_layers=2, encoder_attention_heads=2,
              encoder_ffn_dim=64, num_mel_bins=16,
              max_source_positions=32, activation_function="gelu",
              decoder_layers=2, decoder_attention_heads=2,
              decoder_ffn_dim=64, vocab_size=128, max_length=64,
              scale_embedding=False, max_position_embeddings=64,
              max_target_positions=64)

# per-arch config deltas where the generic template does not fit
_OVERRIDES = {
    "MllamaForConditionalGeneration": {
        "text_config": _tiny_text(cross_attention_layers=[1],
                                  model_type="mllama_text_model"),
        "vision_config": dict(_VISION, num_global_layers=1,
                              intermediate_layers_indices=[0],
                              max_num_tiles=4,
                              supported_aspect_ratios=[[1, 1], [1, 2]]),
    },
    "WhisperForConditionalGeneration": dict(_AUDIO),
    "Qwen2AudioForConditionalGeneration": {
        "text_config": _tiny_text(model_type="qwen2"),
        "audio_config": dict(_AUDIO),
    },
    "UltravoxModel": {
        "text_config": _tiny_text(), "audio_config": dict(_AUDIO),
        "stack_factor": 4, "hidden_size": 16,
    },
    "BartForConditionalGeneration": dict(
        _AUDIO, vocab_size=128, d_model=32,
        decoder_start_token_id=2, forced_eos_token_id=2),
    "BartModel": dict(
        _AUDIO, vocab_size=128, d_model=32,
        decoder_start_token_id=2, forced_eos_token_id=2),
    "Florence2ForConditionalGeneration": {
        "text_config": dict(_AUDIO, vocab_size=128, d_model=32),
        "vision_config": dict(
            model_type="davit", depths=[1, 1], dim_embed=[16, 32],
            num_heads=[2, 2], num_groups=[2, 2], patch_size=[7, 3],
            patch_stride=[4, 2], patch_padding=[3, 1],
            patch_prenorm=[False, True], window_size=4,
            projection_dim=32,
            image_pos_embed={"type": "learned_abs_2d",
                             "max_pos_embeddings": 50},
            visual_temporal_embedding={"type": "COSINE",
                                       "max_temporal_embeddings": 100},
            image_feature_source=["spatial_avg_pool",
                                  "temporal_avg_pool"]),
        "pad_token_id": 1,
    },
    "Florence2LanguageForConditionalGeneration": dict(
        _AUDIO, vocab_size=128, d_model=32,
        vision_config=dict(model_type="davit", depths=[1],
                           dim_embed=[16], num_heads=[2],
                           num_groups=[2], patch_size=[7],
                           patch_stride=[4], patch_padding=[3],
                           patch_prenorm=[False], window_size=4,
                           projection_dim=32)),
}


def _all_archs():
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from vllm_pq_tpu.models.registry import list_supported_archs
    return list_supported_archs()


@pytest.mark.parametrize("arch", _all_archs())
def test_registry_arch_builds(arch, tmp_path):
    import json

    from vllm_pq_tpu.config import EngineConfig
    from vllm_pq_tpu.models.registry import build_model

    raw = _OVERRIDES.get(arch)
    if raw is None:
        raw = _tiny_text()
        raw["text_config"] = _tiny_text()
        raw["llm_config"] = _tiny_text(
            architectures=["Qwen2ForCausalLM"])
        raw["vision_config"] = dict(_VISION)
        raw["audio_config"] = dict(_AUDIO)
    raw = dict(raw)
    raw["architectures"] = [arch]
    d = tmp_path / "m"
    d.mkdir()
    json.dump(raw, open(d / "config.json", "w"))

    from vllm_pq_tpu.quantization.methods import UnquantizedLinearMethod
    cfg = EngineConfig()
    cfg.model.model = str(d)
    cfg.model.dtype = "float32"
    try:
        model, _ = build_model(cfg, UnquantizedLinearMethod())
    except ValueError as e:
        if "speculative draft architecture" in str(e):
            return  # correct resolution: draft rows refuse standalone
        raise
    assert model is not None, arch
    shapes = model.param_shapes()
    assert isinstance(shapes, dict) and shapes, arch
    specs = model.param_specs()
    assert isinstance(specs, dict), arch

    def _check(sh, sp, path=""):
        if isinstance(sh, dict):
            for k in sh:
                assert isinstance(sp, dict) and k in sp, \
                    f"{arch}: {path}{k} has shapes but no spec"
                _check(sh[k], sp[k], f"{path}{k}.")
        elif isinstance(sh, list):
            for i, (a, b) in enumerate(zip(sh, sp)):
                _check(a, b, f"{path}{i}.")
    _check(shapes, specs)
