"""Qwen2-VL image preprocessing (role of reference Qwen2-VL input
mapper; mirrors HF Qwen2VLImageProcessor's patching layout).

Accepts either a raw HWC uint8/float image (resized to patch-grid
multiples and normalized with the CLIP statistics) or a pre-processed
dict {"pixel_values": [N, patch_dim], "image_grid_thw": (t, h, w)}
straight from the HF processor (exact-parity path — byte-identical
patch layout without reimplementing PIL resampling)."""

from typing import Tuple

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class Qwen2VLImageProcessor:

    def __init__(self, patch_size: int = 14, temporal_patch_size: int = 2,
                 merge_size: int = 2, min_pixels: int = 56 * 56,
                 max_pixels: int = 28 * 28 * 1280):
        self.patch_size = patch_size
        self.temporal_patch_size = temporal_patch_size
        self.merge_size = merge_size
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels

    def __call__(self, image) -> Tuple[np.ndarray, Tuple[int, int, int]]:
        """Returns (patches [N, patch_dim], grid (t, h, w))."""
        if isinstance(image, dict):
            pv = np.asarray(image["pixel_values"], np.float32)
            grid = tuple(int(x) for x in
                         np.asarray(image["image_grid_thw"]).reshape(-1))
            return pv, grid
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        h0, w0 = img.shape[:2]
        unit = self.patch_size * self.merge_size
        h = max(unit, int(round(h0 / unit)) * unit)
        w = max(unit, int(round(w0 / unit)) * unit)
        img = self._resize(img, h, w)
        img = (img - CLIP_MEAN) / CLIP_STD
        chw = img.transpose(2, 0, 1)                   # [3, H, W]
        # temporal repeat for a still image (HF repeats the frame)
        frames = np.stack([chw] * self.temporal_patch_size)  # [tps,3,H,W]
        ps, ms, tps = self.patch_size, self.merge_size, \
            self.temporal_patch_size
        gh, gw = h // ps, w // ps
        c = 3
        p = frames.reshape(1, tps, c, gh // ms, ms, ps, gw // ms, ms, ps)
        p = p.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        patches = p.reshape(gh * gw, c * tps * ps * ps)
        return patches.astype(np.float32), (1, gh, gw)

    @staticmethod
    def _resize(img, h, w):
        """Bilinear resize (numpy; raw-image convenience path)."""
        h0, w0 = img.shape[:2]
        if (h0, w0) == (h, w):
            return img
        ys = (np.arange(h) + 0.5) * h0 / h - 0.5
        xs = (np.arange(w) + 0.5) * w0 / w - 0.5
        y0 = np.clip(np.floor(ys).astype(int), 0, h0 - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, w0 - 1)
        y1 = np.clip(y0 + 1, 0, h0 - 1)
        x1 = np.clip(x0 + 1, 0, w0 - 1)
        wy = np.clip(ys - y0, 0, 1)[:, None, None]
        wx = np.clip(xs - x0, 0, 1)[None, :, None]
        a = img[y0][:, x0] * (1 - wy) * (1 - wx)
        b = img[y0][:, x1] * (1 - wy) * wx
        cc = img[y1][:, x0] * wy * (1 - wx)
        d = img[y1][:, x1] * wy * wx
        return (a + b + cc + d).astype(np.float32)
