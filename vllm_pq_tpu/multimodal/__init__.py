"""Multimodal input subsystem (role of reference ``vllm/multimodal/``).

Round-1 scope: image inputs for LLaVA-style models — CLIP vision tower
in JAX, host-side image preprocessing, placeholder-token expansion and
per-request encoder outputs budgeted by the scheduler's
EncoderCacheManager (reference ``v1/core/encoder_cache_manager.py``).
"""

import hashlib
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np


@dataclass
class MMInput:
    """One multimodal input occupying a placeholder span in the prompt.

    ``offset``/``length`` locate the expanded placeholder tokens inside
    prompt_token_ids (reference PlaceholderRange,
    ``vllm/multimodal/inputs.py``)."""
    offset: int
    length: int
    # preprocessed pixel values: [3, H, W] float32 (LLaVA/CLIP) or
    # [N_patches, patch_dim] (Qwen2-VL pre-patched layout)
    pixel_values: Optional[np.ndarray] = None
    # Qwen2-VL: feature grid (t, h, w) in PATCH units + merge size
    grid_thw: Optional[tuple] = None
    merge_size: int = 2
    # content hash for caching/dedup (reference mm hasher)
    mm_hash: str = ""

    def __post_init__(self):
        if not self.mm_hash and self.pixel_values is not None:
            self.mm_hash = hashlib.sha256(
                self.pixel_values.tobytes()).hexdigest()[:32]
