"""Host-side image preprocessing (role of the reference's HF
image-processor integration in ``vllm/multimodal/image.py``).

CLIP-standard pipeline: resize shortest side -> center crop -> scale to
[0,1] -> per-channel normalize. Accepts PIL images or numpy arrays.
Parameters default to OpenAI-CLIP values and can be overridden from a
checkpoint's ``preprocessor_config.json``.
"""

import json
import os
from typing import Any, Optional

import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class ImageProcessor:

    def __init__(self, size: int = 336, mean=CLIP_MEAN, std=CLIP_STD):
        self.size = size
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    @classmethod
    def from_pretrained(cls, model_dir: str,
                        default_size: int = 336) -> "ImageProcessor":
        path = os.path.join(model_dir, "preprocessor_config.json")
        if os.path.isfile(path):
            with open(path) as f:
                raw = json.load(f)
            size = raw.get("crop_size", raw.get("size", default_size))
            if isinstance(size, dict):
                size = size.get("height") or size.get("shortest_edge") \
                    or default_size
            return cls(size=int(size),
                       mean=raw.get("image_mean", CLIP_MEAN),
                       std=raw.get("image_std", CLIP_STD))
        return cls(size=default_size)

    def __call__(self, image: Any) -> np.ndarray:
        """-> pixel_values [3, size, size] float32, CLIP-normalized."""
        arr = self._to_resized_array(image)
        arr = arr.astype(np.float32) / 255.0
        arr = (arr - self.mean) / self.std
        return arr.transpose(2, 0, 1).copy()  # HWC -> CHW

    def _to_resized_array(self, image: Any) -> np.ndarray:
        s = self.size
        try:
            from PIL import Image
            if isinstance(image, Image.Image):
                img = image.convert("RGB")
                w, h = img.size
                scale = s / min(w, h)
                img = img.resize((max(s, round(w * scale)),
                                  max(s, round(h * scale))),
                                 Image.BICUBIC)
                w, h = img.size
                left, top = (w - s) // 2, (h - s) // 2
                img = img.crop((left, top, left + s, top + s))
                return np.asarray(img)
        except ImportError:
            pass
        arr = np.asarray(image)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        if arr.shape[:2] != (s, s):
            # nearest-neighbor fallback for raw arrays without PIL
            yi = (np.arange(s) * arr.shape[0] // s)
            xi = (np.arange(s) * arr.shape[1] // s)
            arr = arr[yi][:, xi]
        return arr[..., :3]
