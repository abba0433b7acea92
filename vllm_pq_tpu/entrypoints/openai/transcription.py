"""OpenAI-compatible audio endpoints: /v1/audio/transcriptions and
/v1/audio/translations (role of reference
``entrypoints/openai/serving_transcription.py``, routed at
``api_server.py:335``), wired to the Whisper encoder-decoder family
(models/whisper.py).

Pipeline: WAV bytes -> mono float32 waveform (stdlib ``wave``; linear
resample to the extractor rate) -> log-mel features (HF
WhisperFeatureExtractor; this image has no soundfile/librosa, so only
WAV uploads are accepted) -> decoder prompt from the tokenizer's task
special tokens (falling back to ``decoder_start_token_id``) ->
``engine.generate`` with ``multi_modal_data={"audio": mel}``.
"""

import io
import json
import os
import wave
from typing import List, Optional, Tuple

import numpy as np

from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)


def load_wav(data: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes -> (mono float32 waveform in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = (np.frombuffer(raw, dtype="<i4").astype(np.float32)
             / 2147483648.0)
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, sr


def resample_linear(x: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    if sr == target_sr:
        return x
    n_out = int(round(len(x) * target_sr / sr))
    return np.interp(np.linspace(0.0, len(x) - 1, n_out, dtype=np.float64),
                     np.arange(len(x), dtype=np.float64),
                     x).astype(np.float32)


def extract_features(waveform: np.ndarray, sr: int, model_path: str,
                     num_mel_bins: int,
                     max_frames: Optional[int]) -> np.ndarray:
    """Log-mel features [n_mels, frames], trimmed/padded to max_frames."""
    from transformers import WhisperFeatureExtractor
    try:
        fe = WhisperFeatureExtractor.from_pretrained(model_path)
    except Exception:  # no preprocessor_config.json: defaults
        fe = WhisperFeatureExtractor(feature_size=num_mel_bins)
    wav = resample_linear(waveform, sr, fe.sampling_rate)
    mel = fe(wav, sampling_rate=fe.sampling_rate,
             return_tensors="np")["input_features"][0]
    mel = np.asarray(mel, np.float32)  # [n_mels, frames]
    if max_frames is not None:
        if mel.shape[1] > max_frames:
            mel = mel[:, :max_frames]
        elif mel.shape[1] < max_frames:
            mel = np.pad(mel, ((0, 0), (0, max_frames - mel.shape[1])),
                         constant_values=float(mel.min()))
    return mel


def _tok_id(tok, token: str) -> Optional[int]:
    try:
        tid = tok.convert_tokens_to_ids(token)
    except Exception:
        return None
    unk = getattr(tok, "unk_token_id", None)
    if tid is None or tid < 0 or (unk is not None and tid == unk):
        return None
    return tid


def build_decoder_prompt(tokenizer, model_config: dict,
                         language: Optional[str],
                         task: str = "transcribe") -> List[int]:
    """Whisper task prompt: <|startoftranscript|>[<|lang|>]<|task|>
    <|notimestamps|>; tiny/golden models without those specials fall
    back to decoder_start_token_id."""
    ids: List[int] = []
    sot = _tok_id(tokenizer, "<|startoftranscript|>")
    if sot is not None:
        ids.append(sot)
        if language:
            lang = _tok_id(tokenizer, f"<|{language.lower()}|>")
            if lang is not None:
                ids.append(lang)
        task_id = _tok_id(tokenizer, f"<|{task}|>")
        if task_id is not None:
            ids.append(task_id)
        nots = _tok_id(tokenizer, "<|notimestamps|>")
        if nots is not None:
            ids.append(nots)
        return ids
    start = model_config.get("decoder_start_token_id")
    if start is None:
        start = model_config.get("bos_token_id", 0)
    return [int(start)]


def read_model_config(model_path: str) -> dict:
    try:
        with open(os.path.join(model_path, "config.json")) as f:
            return json.load(f)
    except Exception:
        return {}


async def run_transcription(engine, model_path: str, audio_bytes: bytes,
                            language: Optional[str], temperature: float,
                            max_tokens: int, request_id: str,
                            task: str = "transcribe") -> Tuple[str, float]:
    """Returns (text, audio_duration_s)."""
    from vllm_pq_tpu.sampling_params import SamplingParams

    wav, sr = load_wav(audio_bytes)
    duration = len(wav) / sr if sr else 0.0
    cfg = read_model_config(model_path)
    n_mels = int(cfg.get("num_mel_bins", 80))
    msp = cfg.get("max_source_positions")
    max_frames = 2 * int(msp) if msp else None
    mel = extract_features(wav, sr, model_path, n_mels, max_frames)

    tok = engine.get_tokenizer()
    prompt_ids = build_decoder_prompt(tok, cfg, language, task)
    sp = SamplingParams(temperature=temperature, max_tokens=max_tokens)
    prompt = {"prompt_token_ids": prompt_ids,
              "multi_modal_data": {"audio": mel}}
    final = None
    async for out in engine.generate(prompt, sp, request_id):
        if out.finished:
            final = out
    text = final.outputs[0].text if final and final.outputs else ""
    return text, duration
