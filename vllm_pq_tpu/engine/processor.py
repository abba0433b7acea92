"""Input processor: prompt -> validated Request (role of reference
``v1/engine/processor.py:125`` process_inputs)."""

import time
from typing import Optional, Union

from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.request import Request
from vllm_pq_tpu.sampling_params import SamplingParams
from vllm_pq_tpu.utils import random_uuid


class Processor:

    def __init__(self, config: EngineConfig, tokenizer):
        self.config = config
        self.tokenizer = tokenizer
        self.max_model_len = config.scheduler.max_model_len
        self.eos_token_id = getattr(tokenizer, "eos_token_id", None)
        # for synthetic-token workloads (benchmarks); conservative floor
        self.vocab_size = getattr(tokenizer, "vocab_size", None) or 256
        self._mm_spec = None  # lazily resolved multimodal spec

    def _mm(self):
        """(image_token_id, num_image_tokens, ImageProcessor) for
        multimodal checkpoints, else None. Resolved from the on-disk HF
        config so the Processor stays model-free (reference multimodal
        registry role)."""
        if self._mm_spec is None:
            import json
            import os
            spec = False
            cfg_file = os.path.join(self.config.model.model, "config.json")
            mistral_file = os.path.join(self.config.model.model,
                                        "params.json")
            raw = None
            if os.path.isfile(cfg_file):
                with open(cfg_file) as f:
                    raw = json.load(f)
            elif os.path.isfile(mistral_file):
                from vllm_pq_tpu.models.registry import \
                    _normalize_params_json
                with open(mistral_file) as f:
                    raw = _normalize_params_json(json.load(f))
            if raw is not None:
                arch0 = (raw.get("architectures")
                         or (raw.get("text_config") or {}).get(
                             "architectures")
                         or [""])[0]
                if not arch0:
                    arch0 = {
                        "qwen2_vl": "Qwen2VLForConditionalGeneration",
                        "qwen2_5_vl":
                            "Qwen2_5_VLForConditionalGeneration",
                        "llava": "LlavaForConditionalGeneration",
                    }.get(raw.get("model_type", ""), "")
                if arch0 == "WhisperForConditionalGeneration":
                    spec = ("whisper",)
                elif arch0 in ("BartForConditionalGeneration",
                               "BartModel"):
                    spec = ("encdec_text",)
                elif arch0 in (
                        "Florence2ForConditionalGeneration",
                        "Florence2LanguageForConditionalGeneration"):
                    from vllm_pq_tpu.multimodal.image import \
                        ImageProcessor
                    spec = ("florence2",
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=768))
                elif arch0 == "MllamaForConditionalGeneration":
                    from vllm_pq_tpu.multimodal.image import \
                        ImageProcessor
                    vc = raw.get("vision_config", {})
                    tcfg = raw.get("text_config", {})
                    spec = ("mllama",
                            raw.get("image_token_index",
                                    tcfg.get("vocab_size", 128256)),
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=vc.get("image_size", 448)))
                elif arch0 in ("Qwen2VLForConditionalGeneration",
                               "Qwen2_5_VLForConditionalGeneration"):
                    from vllm_pq_tpu.multimodal.qwen2vl_image import \
                        Qwen2VLImageProcessor
                    vc = raw.get("vision_config", {})
                    spec = ("qwen2vl",
                            raw.get("image_token_id", 151655),
                            Qwen2VLImageProcessor(
                                patch_size=vc.get("patch_size", 14),
                                temporal_patch_size=vc.get(
                                    "temporal_patch_size", 2),
                                merge_size=vc.get("spatial_merge_size",
                                                  2)))
                elif arch0 == "Blip2ForConditionalGeneration":
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config", {})
                    size = vc.get("image_size", 224)
                    spec = (raw.get("image_token_index", 50265),
                            int(raw.get("num_query_tokens", 32)),
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=size))
                elif arch0 == "Qwen2AudioForConditionalGeneration":
                    ac = raw.get("audio_config", {})
                    spec = ("qwen2audio",
                            raw.get("audio_token_index", 151646),
                            int(ac.get("max_source_positions", 1500)),
                            int(ac.get("num_mel_bins", 128)))
                elif arch0 == "MolmoForCausalLM":
                    # <im_patch> id from the tokenizer (reference
                    # molmo.py:1065 vocab lookup); one placeholder
                    # expands to the pooled (24+1)//2 ^2 = 144 span
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    pid = raw.get("image_patch_id")
                    if pid is None:
                        getv = getattr(self.tokenizer,
                                       "convert_tokens_to_ids", None)
                        pid = getv("<im_patch>") if getv else None
                    if pid is None or pid < 0:
                        emb = (raw.get("embedding_size")
                               or raw.get("vocab_size", 152064))
                        pid = emb + 2
                    mvc = (raw.get("vision_config")
                           or raw.get("vision_backbone") or {})
                    msz = mvc.get("image_size", 336)
                    mside = msz // mvc.get("patch_size", 14)
                    spec = (int(pid), ((mside + 1) // 2) ** 2,
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=msz))
                elif (arch0 in ("QWenLMHeadModel",
                                "QwenVLForConditionalGeneration")
                      and raw.get("visual")):
                    # Qwen-VL v1: one image_pad placeholder expands to
                    # n_queries resampled tokens (reference qwen_vl.py
                    # QwenVLProcessor)
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw["visual"]
                    spec = (int(vc.get("image_start_id", 151857)) + 2,
                            int(vc.get("n_queries", 256)),
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=vc.get("image_size", 448)))
                elif arch0 == "GLM4VForCausalLM":
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config", {})
                    vsize = vc.get("image_size", 1120)
                    side = vsize // vc.get("patch_size", 14)
                    spec = (raw.get("boi_token_id", 151339),
                            (side // 2) ** 2 + 2,
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=vsize))
                elif arch0 == "DeepseekVLV2ForCausalLM":
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config", {})
                    pc = raw.get("projector_config", {})
                    vsize = vc.get("image_size", 384)
                    psize = vc.get("patch_size", 14)
                    r = pc.get("downsample_ratio", 2)
                    side2 = -(-(vsize // psize) // r)
                    spec = ("deepseek_vl2",
                            raw.get("image_token_id", 100015), side2,
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=vsize))
                elif arch0 in ("MiniCPMV", "MiniCPMO"):
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config", {})
                    vsize = vc.get("image_size", 448)
                    spec = (raw.get("image_token_id")
                            or raw.get("unk_token_id", 128244),
                            raw.get("query_num", 64),
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=vsize))
                elif arch0 == "AriaForConditionalGeneration":
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config", {})
                    vsize = vc.get("image_size", 980)
                    psize = vc.get("patch_size", 14)
                    p2q = {int(k): int(v) for k, v in (
                        raw.get("projector_patch_to_query_dict")
                        or {1225: 128, 4900: 256}).items()}
                    patches = (vsize // psize) ** 2
                    spec = (raw.get("image_token_index", 9),
                            p2q.get(patches, max(p2q.values())),
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=vsize))
                elif arch0 == "Phi3VForCausalLM":
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config") or {}
                    vsize = vc.get("image_size", 336)
                    psize = vc.get("patch_size", 14)
                    spec = ("phi3v",
                            raw.get("image_token_id", 32044),
                            vsize, (vsize // psize) // 2,
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=vsize))
                elif arch0 == "Phi4MMForCausalLM":
                    # Phi-4-MM rides the phi3v HD expansion with
                    # side2 = (448/14)/2/2 = 8 (AvgPool compression);
                    # the extended fields carry the AUDIO placeholder
                    # (conformer span = ceil(frames / time_reduction))
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config") or {}
                    vsize = vc.get("image_size", 448)
                    psize = vc.get("patch_size", 14)
                    ap = ((raw.get("audio_processor") or {})
                          .get("config") or {})
                    spec = ("phi3v",
                            raw.get("image_token_id", 200010),
                            vsize, (vsize // psize) // 4,
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=vsize),
                            raw.get("audio_token_id", 200011),
                            ap.get("time_reduction", 8),
                            ap.get("input_size", 80))
                elif arch0 == "UltravoxModel":
                    ac = raw.get("audio_config", {})
                    spec = ("ultravox",
                            raw.get("audio_token_index", 32000),
                            int(raw.get("stack_factor", 8)),
                            int(ac.get("num_mel_bins", 128)))
                elif arch0 == "FuyuForCausalLM":
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    size = raw.get("image_size") or 300
                    ps = raw.get("patch_size", 30)
                    spec = (raw.get("image_token_id", 71011),
                            (size // ps) ** 2,
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=size))
                elif arch0 in ("Idefics3ForConditionalGeneration",
                               "SmolVLMForConditionalGeneration"):
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config", {})
                    size = vc.get("image_size", 364)
                    sf = int(raw.get("scale_factor", 2))
                    patches = (size // vc.get("patch_size", 14)) ** 2
                    spec = (raw.get("image_token_id", 128257),
                            patches // (sf * sf),
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=size))
                elif arch0 in ("InternVLForConditionalGeneration",
                               "InternVLChatModel", "NVLM_D",
                               "H2OVLChatModel"):
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config", {})

                    def _sc(v, dflt):
                        v = vc.get(v, dflt)
                        return v[0] if isinstance(v, (list, tuple)) else v
                    size = _sc("image_size", 448)
                    ds = raw.get("downsample_ratio", 0.5)
                    patches = (size // _sc("patch_size", 14)) ** 2
                    spec = (raw.get("image_token_id", 151667),
                            int(patches * ds * ds),
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=size))
                elif arch0 == "PaliGemmaForConditionalGeneration":
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config", {})
                    size = vc.get("image_size", 224)
                    patches = (size // vc.get("patch_size", 14)) ** 2
                    spec = (raw.get("image_token_index", 257152),
                            patches,
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=size))
                elif arch0 == "LlavaNextVideoForConditionalGeneration":
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config", {})
                    vsize = vc.get("image_size", 336)
                    spec = ("llava_next_video",
                            raw.get("image_token_index", 32001),
                            raw.get("video_token_index", 32000),
                            raw.get("image_grid_pinpoints") or
                            [[vsize, 2 * vsize]],
                            vsize, vc.get("patch_size", 14),
                            raw.get("vision_feature_select_strategy",
                                    "default"),
                            raw.get("spatial_pool_stride", 2),
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=vsize))
                elif arch0 == "LlavaOnevisionForConditionalGeneration":
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config", {})
                    vsize = vc.get("image_size", 384)
                    var = raw.get("vision_aspect_ratio", "anyres_max_9")
                    spec = ("llava_onevision",
                            raw.get("image_token_index", 151646),
                            raw.get("video_token_index", 151647),
                            raw.get("image_grid_pinpoints") or
                            [[vsize, 2 * vsize]],
                            vsize, vc.get("patch_size", 14),
                            int(var.split("_")[-1] or 9),
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=vsize))
                elif arch0 == "LlavaNextForConditionalGeneration":
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config", {})
                    vsize = vc.get("image_size", 336)
                    spec = ("llava_next",
                            raw.get("image_token_index", 32000),
                            raw.get("image_grid_pinpoints") or
                            [[vsize, 2 * vsize]],
                            vsize, vc.get("patch_size", 14),
                            raw.get("vision_feature_select_strategy",
                                    "default"),
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=vsize))
                elif arch0 == "PixtralForConditionalGeneration":
                    # Mistral-format standalone Pixtral: the [IMG]
                    # placeholder expands to the ViT patch count;
                    # break/end tokens stay literal prompt tokens
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config", {})
                    size = vc.get("image_size", 1024)
                    patches = (size // vc.get("patch_size", 16)) ** 2
                    spec = (vc.get("image_token_id", 10), patches,
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=size))
                elif arch0 == "LlavaForConditionalGeneration":
                    from vllm_pq_tpu.multimodal.image import ImageProcessor
                    vc = raw.get("vision_config", {})
                    size = vc.get("image_size", 336)
                    patches = (size // vc.get("patch_size", 14)) ** 2
                    # pixtral towers have no CLS row: "full" selects
                    # exactly the patch rows
                    if (vc.get("model_type") != "pixtral"
                            and raw.get("vision_feature_select_strategy",
                                        "default") != "default"):
                        patches += 1
                    spec = (raw.get("image_token_index", 32000), patches,
                            ImageProcessor.from_pretrained(
                                self.config.model.model,
                                default_size=size))
            self._mm_spec = spec
        return self._mm_spec or None

    def _expand_mm(self, token_ids, mm_data):
        """Expand each image placeholder token into its patch-token span
        and attach preprocessed pixels (reference mm input mapper +
        placeholder expansion)."""
        from vllm_pq_tpu.multimodal import MMInput
        spec = self._mm()
        if spec and spec[0] == "qwen2audio":
            # audio splice (NOT cross-attention like whisper): each
            # <|AUDIO|> placeholder expands to the TRUE output frame
            # count; the mel pads to the encoder's fixed input length
            import numpy as np
            from vllm_pq_tpu.multimodal import MMInput
            _, audio_tok, max_src, nmel = spec
            audios = mm_data.get("audio")
            if audios is None:
                raise ValueError("multi_modal_data must contain 'audio'")
            if not isinstance(audios, (list, tuple)):
                audios = [audios]
            spots = [i for i, t in enumerate(token_ids)
                     if t == audio_tok]
            if len(spots) != len(audios):
                raise ValueError(
                    f"prompt has {len(spots)} audio placeholders but "
                    f"{len(audios)} audios were provided")
            out: list = []
            mm_inputs = []
            prev = 0
            exp_len = 2 * max_src
            for spot, au in zip(spots, audios):
                mel = np.asarray(au, np.float32)
                if mel.ndim == 3:
                    mel = mel[0]
                t_true = mel.shape[1]
                if t_true < exp_len:
                    mel = np.pad(mel, ((0, 0), (0, exp_len - t_true)))
                else:
                    mel = mel[:, :exp_len]
                    t_true = exp_len
                # HF _get_feat_extract_output_lengths
                n = ((t_true - 1) // 2 + 1 - 2) // 2 + 1
                out.extend(token_ids[prev:spot])
                mm_inputs.append(MMInput(offset=len(out), length=n,
                                         pixel_values=mel))
                out.extend([audio_tok] * n)
                prev = spot + 1
            out.extend(token_ids[prev:])
            return out, mm_inputs
        if spec and spec[0] == "deepseek_vl2":
            # DeepSeek-VL2: global h*(w+1) + separator + tile-grid
            # local views (reference deepseek_vl2.py:160). Pixels
            # arrive [1 + tw*th, 3, S, S], GLOBAL first.
            import numpy as np

            from vllm_pq_tpu.models.deepseek_vl2 import deepseek_vl2_span
            from vllm_pq_tpu.multimodal import MMInput
            _, image_tok, side2, improc = spec
            images = mm_data.get("image")
            if images is None:
                raise ValueError("multi_modal_data must contain 'image'")
            if not isinstance(images, (list, tuple)):
                images = [images]
            spots = [i for i, t in enumerate(token_ids)
                     if t == image_tok]
            if len(spots) != len(images):
                raise ValueError("image placeholder count mismatch")
            out: list = []
            mm_inputs = []
            prev = 0
            for spot, img in zip(spots, images):
                out.extend(token_ids[prev:spot])
                if isinstance(img, dict):
                    px = np.asarray(img["pixel_values"], np.float32)
                    tw, th = (int(v) for v in img.get(
                        "spatial_crop", (0, 0)))
                else:
                    base = improc(np.asarray(img))
                    px = base[None].astype(np.float32)
                    tw = th = 0
                n_tok = deepseek_vl2_span(side2, tw, th)
                mm_inputs.append(MMInput(offset=len(out), length=n_tok,
                                         pixel_values=px,
                                         grid_thw=(tw, th)))
                out.extend([image_tok] * n_tok)
                prev = spot + 1
            out.extend(token_ids[prev:])
            return out, mm_inputs
        if spec and spec[0] == "phi3v" and len(spec) > 5 \
                and "audio" in mm_data:
            # Phi-4-MM audio: each placeholder expands to
            # ceil(mel_frames / time_reduction) conformer tokens; the
            # payload is the precomputed logfbank [T, n_mels]
            import numpy as np
            from vllm_pq_tpu.multimodal import MMInput
            audio_tok, reduction = spec[5], spec[6]
            audios = mm_data["audio"]
            if not isinstance(audios, (list, tuple)):
                audios = [audios]
            spots = [i for i, t in enumerate(token_ids)
                     if t == audio_tok]
            if len(spots) != len(audios):
                raise ValueError(
                    f"prompt has {len(spots)} audio placeholders but "
                    f"{len(audios)} audios were provided")
            out: list = []
            mm_inputs = []
            prev = 0
            for spot, au in zip(spots, audios):
                out.extend(token_ids[prev:spot])
                mel = np.asarray(
                    au["mel"] if isinstance(au, dict) else au,
                    np.float32)
                n_tok = -(-mel.shape[0] // reduction)
                mm_inputs.append(MMInput(offset=len(out), length=n_tok,
                                         pixel_values=mel))
                out.extend([audio_tok] * n_tok)
                prev = spot + 1
            out.extend(token_ids[prev:])
            return out, mm_inputs
        if spec and spec[0] == "phi3v":
            # Phi-3-Vision HD transform spans (reference phi3v.py
            # get_num_image_tokens); pixels arrive [crops+1, 3, S, S]
            # with the GLOBAL crop first
            import numpy as np

            from vllm_pq_tpu.models.phi3v import phi3v_feature_span
            from vllm_pq_tpu.multimodal import MMInput
            image_tok, vsize, side2, improc = spec[1:5]
            images = mm_data.get("image")
            if images is None:
                raise ValueError("multi_modal_data must contain 'image'")
            if not isinstance(images, (list, tuple)):
                images = [images]
            spots = [i for i, t in enumerate(token_ids)
                     if t == image_tok]
            if len(spots) != len(images):
                raise ValueError("image placeholder count mismatch")
            out: list = []
            mm_inputs = []
            prev = 0
            for spot, img in zip(spots, images):
                out.extend(token_ids[prev:spot])
                if isinstance(img, dict):
                    px = np.asarray(img["pixel_values"], np.float32)
                    h0, w0 = (int(v) for v in img["image_size"])
                    h_crop, w_crop = max(h0 // vsize, 1), \
                        max(w0 // vsize, 1)
                else:
                    # raw image: single-crop fallback (global + 1 sub)
                    base = improc(np.asarray(img))
                    px = np.stack([base, base]).astype(np.float32)
                    h_crop = w_crop = 1
                n_tok = phi3v_feature_span(h_crop, w_crop, side2)
                mm_inputs.append(MMInput(offset=len(out), length=n_tok,
                                         pixel_values=px,
                                         grid_thw=(h_crop, w_crop)))
                out.extend([image_tok] * n_tok)
                prev = spot + 1
            out.extend(token_ids[prev:])
            return out, mm_inputs
        if spec and spec[0] == "ultravox":
            # Ultravox audio splice: mel runs at its TRUE length
            # (ModifiedWhisperEncoder slices positions); placeholder
            # span = ceil(conv_out_frames / stack_factor)
            import numpy as np
            from vllm_pq_tpu.multimodal import MMInput
            _, audio_tok, sf, nmel = spec
            audios = mm_data.get("audio")
            if audios is None:
                raise ValueError("multi_modal_data must contain 'audio'")
            if not isinstance(audios, (list, tuple)):
                audios = [audios]
            spots = [i for i, t in enumerate(token_ids)
                     if t == audio_tok]
            if len(spots) != len(audios):
                raise ValueError(
                    f"prompt has {len(spots)} audio placeholders but "
                    f"{len(audios)} audios were provided")
            out: list = []
            mm_inputs = []
            prev = 0
            for spot, au in zip(spots, audios):
                mel = np.asarray(au, np.float32)
                if mel.ndim == 3:
                    mel = mel[0]
                t_mel = mel.shape[1]
                t_half = (t_mel - 1) // 2 + 1  # conv2 stride 2, pad 1
                n = -(-t_half // sf)
                out.extend(token_ids[prev:spot])
                mm_inputs.append(MMInput(offset=len(out), length=n,
                                         pixel_values=mel))
                out.extend([audio_tok] * n)
                prev = spot + 1
            out.extend(token_ids[prev:])
            return out, mm_inputs
        if spec and spec[0] == "encdec_text":
            # text encoder-decoder (BART): the encoder prompt rides
            # multi_modal_data["encoder"] (token ids); prompt_token_ids
            # is the decoder prompt (reference
            # ExplicitEncoderDecoderPrompt role)
            import numpy as np
            from vllm_pq_tpu.multimodal import MMInput
            enc = mm_data.get("encoder")
            if enc is None:
                raise ValueError(
                    "encoder-decoder text models take the encoder "
                    "prompt via multi_modal_data={'encoder': [ids]}")
            ids_arr = np.asarray(enc, np.int32)
            return list(token_ids), [MMInput(offset=0, length=0,
                                             pixel_values=ids_arr)]
        if spec and spec[0] == "florence2":
            # encoder-decoder: encoder token ids ride
            # multi_modal_data["encoder"]; an optional image's DaViT
            # tokens are PREPENDED to the encoder text embeddings
            # (reference florence2.py get_input_embeddings merge)
            import numpy as np
            from vllm_pq_tpu.multimodal import MMInput
            improc = spec[1]
            enc = mm_data.get("encoder")
            if enc is None:
                raise ValueError(
                    "florence2 takes the encoder prompt via "
                    "multi_modal_data={'encoder': [ids], 'image': ...}")
            ids_arr = np.asarray(enc, np.int32)
            images = mm_data.get("image")
            if images is None:
                payload = ids_arr
            else:
                if isinstance(images, (list, tuple)):
                    images = images[0]
                px = (np.asarray(images["pixel_values"], np.float32)
                      if isinstance(images, dict)
                      else improc(images))
                payload = (ids_arr, px)
            import hashlib as _hl
            hh = _hl.sha256()
            for part in (payload if isinstance(payload, tuple)
                         else (payload,)):
                hh.update(np.ascontiguousarray(part).tobytes())
            return list(token_ids), [MMInput(
                offset=0, length=0, pixel_values=payload,
                mm_hash=hh.hexdigest()[:32])]
        if spec and spec[0] == "whisper":
            # audio attaches whole (no placeholder expansion): the
            # decoder cross-attends to the encoder output
            import numpy as np
            from vllm_pq_tpu.multimodal import MMInput
            audio = mm_data.get("audio")
            if audio is None:
                raise ValueError("multi_modal_data must contain 'audio'")
            if isinstance(audio, dict):
                audio = audio.get("input_features", audio)
            mel = np.asarray(audio, np.float32)
            if mel.ndim == 3:
                mel = mel[0]
            return list(token_ids), [MMInput(offset=0, length=0,
                                             pixel_values=mel)]
        if spec and spec[0] == "mllama":
            # the image participates via cross-attention only; the
            # <|image|> token stays a single ordinary token and its
            # position gates cross-attention visibility (reference
            # mllama cross_attention_mask semantics)
            import numpy as np
            from vllm_pq_tpu.multimodal import MMInput
            _, image_tok, improc = spec
            images = mm_data.get("image")
            if images is None:
                raise ValueError("multi_modal_data must contain 'image'")
            if isinstance(images, (list, tuple)):
                if len(images) != 1:
                    raise ValueError(
                        "mllama currently supports one image/request")
                images = images[0]
            spots = [i for i, t in enumerate(token_ids)
                     if t == image_tok]
            if len(spots) != 1:
                raise ValueError(
                    f"prompt must contain exactly one image token "
                    f"({image_tok}); found {len(spots)}")
            pix = improc(images)
            return list(token_ids), [MMInput(offset=spots[0], length=0,
                                             pixel_values=pix)]
        if spec and spec[0] == "qwen2vl":
            return self._expand_mm_qwen2vl(token_ids, mm_data, spec)
        if spec and spec[0] == "llava_next":
            return self._expand_mm_llava_next(token_ids, mm_data, spec)
        if spec and spec[0] == "llava_onevision":
            return self._expand_mm_onevision(token_ids, mm_data, spec)
        if spec and spec[0] == "llava_next_video":
            return self._expand_mm_next_video(token_ids, mm_data, spec)
        if spec is None:
            raise ValueError(
                "multi_modal_data passed but the model is not multimodal")
        image_tok, n_tok, improc = spec
        images = mm_data.get("image")
        if images is None:
            raise ValueError("multi_modal_data must contain 'image'")
        if not isinstance(images, (list, tuple)):
            images = [images]
        spots = [i for i, t in enumerate(token_ids) if t == image_tok]
        if len(spots) != len(images):
            raise ValueError(
                f"prompt has {len(spots)} image placeholders but "
                f"{len(images)} images were provided")
        out: list = []
        mm_inputs = []
        prev = 0
        import numpy as np
        for spot, img in zip(spots, images):
            out.extend(token_ids[prev:spot])
            px = (np.asarray(img["pixel_values"], np.float32)
                  if isinstance(img, dict) else improc(img))
            mm_inputs.append(MMInput(offset=len(out), length=n_tok,
                                     pixel_values=px))
            out.extend([image_tok] * n_tok)
            prev = spot + 1
        out.extend(token_ids[prev:])
        return out, mm_inputs

    def _expand_mm_next_video(self, token_ids, mm_data, spec):
        """LLaVA-NeXT-Video: anyres image spans + avg-pooled video spans
        (reference models/llava_next_video.py get_num_video_tokens)."""
        import numpy as np

        from vllm_pq_tpu.models.llava_next_video import next_video_span
        from vllm_pq_tpu.multimodal import MMInput
        from vllm_pq_tpu.multimodal.llava_next import feature_span
        (_, image_tok, video_tok, pinpoints, vsize, psize, strategy,
         stride, improc) = spec
        images = mm_data.get("image") or []
        videos = mm_data.get("video") or []
        if not isinstance(images, (list, tuple)):
            images = [images]
        if not isinstance(videos, (list, tuple)):
            videos = [videos]
        spots = [(i, t) for i, t in enumerate(token_ids)
                 if t in (image_tok, video_tok)]
        n_img = sum(1 for _, t in spots if t == image_tok)
        if n_img != len(images) or len(spots) - n_img != len(videos):
            raise ValueError("placeholder / multimodal input count "
                             "mismatch")
        out: list = []
        mm_inputs = []
        prev = 0
        img_it, vid_it = iter(images), iter(videos)
        for spot, tok in spots:
            out.extend(token_ids[prev:spot])
            if tok == image_tok:
                img = next(img_it)
                if isinstance(img, dict):
                    px = np.asarray(img["pixel_values"], np.float32)
                    h0, w0 = (int(v) for v in img["image_size"])
                else:
                    px, (h0, w0) = self._anyres_pixels(
                        img, pinpoints, vsize, improc)
                n_tok = feature_span((h0, w0), pinpoints, vsize, psize,
                                     strategy)
                mm_inputs.append(MMInput(offset=len(out), length=n_tok,
                                         pixel_values=px,
                                         grid_thw=(h0, w0)))
                out.extend([image_tok] * n_tok)
            else:
                vid = next(vid_it)
                if isinstance(vid, dict):
                    px = np.asarray(vid["pixel_values"], np.float32)
                else:
                    px = np.stack([improc(f) for f in np.asarray(vid)]) \
                        .astype(np.float32)
                n_tok = next_video_span(px.shape[0], vsize, psize,
                                        stride)
                mm_inputs.append(MMInput(
                    offset=len(out), length=n_tok, pixel_values=px,
                    grid_thw=("video", px.shape[0])))
                out.extend([video_tok] * n_tok)
            prev = spot + 1
        out.extend(token_ids[prev:])
        return out, mm_inputs

    def _expand_mm_onevision(self, token_ids, mm_data, spec):
        """LLaVA-OneVision: anyres_max image spans + pooled video spans
        (reference models/llava_onevision.py get_num_image_tokens /
        get_num_video_tokens)."""
        import numpy as np

        from vllm_pq_tpu.models.llava_onevision import (
            onevision_feature_span, onevision_video_span)
        from vllm_pq_tpu.multimodal import MMInput
        (_, image_tok, video_tok, pinpoints, vsize, psize, max_patches,
         improc) = spec
        images = mm_data.get("image") or []
        videos = mm_data.get("video") or []
        if not isinstance(images, (list, tuple)):
            images = [images]
        if not isinstance(videos, (list, tuple)):
            videos = [videos]
        spots = [(i, t) for i, t in enumerate(token_ids)
                 if t in (image_tok, video_tok)]
        n_img = sum(1 for _, t in spots if t == image_tok)
        n_vid = len(spots) - n_img
        if n_img != len(images) or n_vid != len(videos):
            raise ValueError(
                f"prompt has {n_img} image / {n_vid} video placeholders "
                f"but {len(images)} images / {len(videos)} videos were "
                f"provided")
        out: list = []
        mm_inputs = []
        prev = 0
        img_it, vid_it = iter(images), iter(videos)
        for spot, tok in spots:
            out.extend(token_ids[prev:spot])
            if tok == image_tok:
                img = next(img_it)
                if isinstance(img, dict):
                    px = np.asarray(img["pixel_values"], np.float32)
                    h0, w0 = (int(v) for v in img["image_size"])
                else:
                    px, (h0, w0) = self._anyres_pixels(
                        img, pinpoints, vsize, improc)
                n_tok = onevision_feature_span((h0, w0), pinpoints,
                                               vsize, psize, max_patches)
                mm_inputs.append(MMInput(offset=len(out), length=n_tok,
                                         pixel_values=px,
                                         grid_thw=(h0, w0)))
                out.extend([image_tok] * n_tok)
            else:
                vid = next(vid_it)
                if isinstance(vid, dict):
                    px = np.asarray(vid["pixel_values"], np.float32)
                else:
                    frames = np.asarray(vid)
                    px = np.stack([improc(f) for f in frames]) \
                        .astype(np.float32)
                n_tok = onevision_video_span(px.shape[0], vsize, psize)
                mm_inputs.append(MMInput(
                    offset=len(out), length=n_tok, pixel_values=px,
                    grid_thw=("video", px.shape[0])))
                out.extend([video_tok] * n_tok)
            prev = spot + 1
        out.extend(token_ids[prev:])
        return out, mm_inputs

    def _expand_mm_llava_next(self, token_ids, mm_data, spec):
        """LLaVA-NeXT anyres: the placeholder span depends on each
        image's original size (base crop + unpadded grid + one newline
        per row; reference models/llava_next.py get_num_image_tokens).
        Accepts HF-preprocessed dicts {"pixel_values": [P+1,3,h,w],
        "image_size": (H0, W0)} for exact parity, or raw images which
        are anyres-preprocessed host-side."""
        import numpy as np

        from vllm_pq_tpu.multimodal import MMInput
        from vllm_pq_tpu.multimodal.llava_next import feature_span
        _, image_tok, pinpoints, vsize, psize, strategy, improc = spec
        images = mm_data.get("image")
        if images is None:
            raise ValueError("multi_modal_data must contain 'image'")
        if not isinstance(images, (list, tuple)):
            images = [images]
        spots = [i for i, t in enumerate(token_ids) if t == image_tok]
        if len(spots) != len(images):
            raise ValueError(
                f"prompt has {len(spots)} image placeholders but "
                f"{len(images)} images were provided")
        out: list = []
        mm_inputs = []
        prev = 0
        for spot, img in zip(spots, images):
            out.extend(token_ids[prev:spot])
            if isinstance(img, dict):
                px = np.asarray(img["pixel_values"], np.float32)
                h0, w0 = (int(v) for v in img["image_size"])
            else:
                px, (h0, w0) = self._anyres_pixels(img, pinpoints,
                                                   vsize, improc)
            n_tok = feature_span((h0, w0), pinpoints, vsize, psize,
                                 strategy)
            mm_inputs.append(MMInput(offset=len(out), length=n_tok,
                                     pixel_values=px,
                                     grid_thw=(h0, w0)))
            out.extend([image_tok] * n_tok)
            prev = spot + 1
        out.extend(token_ids[prev:])
        return out, mm_inputs

    @staticmethod
    def _anyres_pixels(img, pinpoints, vsize, improc):
        """Raw image -> [P+1, 3, vsize, vsize] anyres crops (base first)
        following the HF llava-next image processor: resize-to-fit the
        best pinpoint resolution, center-pad, tile row-major."""
        import numpy as np

        from vllm_pq_tpu.multimodal.llava_next import \
            select_best_resolution
        arr = np.asarray(img)
        if arr.ndim == 3 and arr.shape[0] == 3:
            arr = arr.transpose(1, 2, 0)
        h0, w0 = arr.shape[:2]
        bh, bw = select_best_resolution((h0, w0), pinpoints)
        base = improc(arr)  # [3, vsize, vsize]
        scale = min(bw / w0, bh / h0)
        nh, nw = int(h0 * scale), int(w0 * scale)
        try:
            from PIL import Image
            rim = Image.fromarray(arr.astype(np.uint8)).resize(
                (nw, nh), Image.BICUBIC)
            resized = np.asarray(rim, np.float32)
        except Exception:
            yi = (np.arange(nh) * h0 // nh).clip(0, h0 - 1)
            xi = (np.arange(nw) * w0 // nw).clip(0, w0 - 1)
            resized = arr[yi][:, xi].astype(np.float32)
        canvas = np.zeros((bh, bw, 3), np.float32)
        top, left = (bh - nh) // 2, (bw - nw) // 2
        canvas[top:top + nh, left:left + nw] = resized
        canvas = (canvas / 255.0 - improc.mean) / improc.std
        tiles = [canvas[r:r + vsize, c:c + vsize].transpose(2, 0, 1)
                 for r in range(0, bh, vsize)
                 for c in range(0, bw, vsize)]
        return (np.stack([base] + tiles).astype(np.float32),
                (h0, w0))

    def _expand_mm_qwen2vl(self, token_ids, mm_data, spec):
        """Qwen2-VL: the placeholder count depends on each image's
        patch grid (t*h*w / merge^2)."""
        from vllm_pq_tpu.multimodal import MMInput
        _, image_tok, improc = spec
        images = mm_data.get("image")
        if images is None:
            raise ValueError("multi_modal_data must contain 'image'")
        if not isinstance(images, (list, tuple)):
            images = [images]
        spots = [i for i, t in enumerate(token_ids) if t == image_tok]
        if len(spots) != len(images):
            raise ValueError(
                f"prompt has {len(spots)} image placeholders but "
                f"{len(images)} images were provided")
        out: list = []
        mm_inputs = []
        prev = 0
        for spot, img in zip(spots, images):
            out.extend(token_ids[prev:spot])
            patches, grid = improc(img)
            t, gh, gw = grid
            ms = improc.merge_size
            n_tok = t * (gh // ms) * (gw // ms)
            mm_inputs.append(MMInput(
                offset=len(out), length=n_tok, pixel_values=patches,
                grid_thw=grid, merge_size=ms))
            out.extend([image_tok] * n_tok)
            prev = spot + 1
        out.extend(token_ids[prev:])
        return out, mm_inputs

    def process_inputs(
        self,
        prompt: Union[str, dict],
        sampling_params: SamplingParams,
        request_id: Optional[str] = None,
        arrival_time: Optional[float] = None,
        priority: int = 0,
        lora_request=None,
    ) -> Request:
        request_id = request_id or random_uuid()
        mm_inputs = None
        if isinstance(prompt, dict):
            # TokensPrompt / TextPrompt dicts (reference inputs/data.py)
            if "prompt_token_ids" in prompt:
                token_ids = list(prompt["prompt_token_ids"])
                text = prompt.get("prompt")
            else:
                text = prompt["prompt"]
                token_ids = self.tokenizer.encode(text)
            if prompt.get("multi_modal_data"):
                token_ids, mm_inputs = self._expand_mm(
                    token_ids, prompt["multi_modal_data"])
        else:
            text = prompt
            token_ids = self.tokenizer.encode(text)

        sp = sampling_params
        if sp.truncate_prompt_tokens and not mm_inputs:
            token_ids = token_ids[-sp.truncate_prompt_tokens:]
        if not token_ids:
            raise ValueError("empty prompt")
        if len(token_ids) >= self.max_model_len:
            raise ValueError(
                f"prompt ({len(token_ids)} tokens) is longer than "
                f"max_model_len ({self.max_model_len})")
        # cap generation to the model window
        budget = self.max_model_len - len(token_ids)
        if sp.max_tokens is None or sp.max_tokens > budget:
            sp = sp.clone()
            sp.max_tokens = budget

        request = Request(
            request_id=request_id,
            prompt_token_ids=token_ids,
            sampling_params=sp,
            eos_token_id=self.eos_token_id,
            arrival_time=arrival_time or time.monotonic(),
            prompt=text,
            priority=priority,
            mm_inputs=mm_inputs,
        )
        request.lora_request = lora_request
        self._attach_constraints(request, sp)
        return request

    def _attach_constraints(self, request: Request, sp) -> None:
        """Compile guided decoding / allowed ids / bad words into host
        state carried on the request (reference: per-request logits
        processors; here constraint masks ride the packed transfer)."""
        import numpy as np
        if sp.guided_decoding is not None:
            from vllm_pq_tpu.guided import build_guided_fsm
            request.guided_fsm = build_guided_fsm(sp.guided_decoding,
                                                  self.tokenizer)
        if sp.allowed_token_ids:
            mask = np.zeros(self.vocab_size, bool)
            ids = [t for t in sp.allowed_token_ids
                   if 0 <= t < self.vocab_size]
            if not ids:
                raise ValueError("allowed_token_ids has no valid ids")
            mask[ids] = True
            if self.eos_token_id is not None:
                mask[self.eos_token_id] = True
            request.allowed_mask = mask
        if sp.bad_words:
            seqs = []
            for w in sp.bad_words:
                for variant in (w, " " + w):
                    try:
                        toks = self.tokenizer.encode(
                            variant, add_special_tokens=False)
                    except TypeError:
                        toks = self.tokenizer.encode(variant)
                    # strip a leading BOS if the tokenizer insists
                    bos = getattr(self.tokenizer, "bos_token_id", None)
                    if toks and bos is not None and toks[0] == bos:
                        toks = toks[1:]
                    if toks:
                        seqs.append(list(toks))
            request.bad_words_ids = seqs
