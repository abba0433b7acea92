"""LLaVA-NeXT (anyres) host-side grid math — role of the reference's
``model_executor/models/llava_next.py`` helpers
(``get_anyres_image_grid_shape`` / ``unpad_image``) and the HF
image-processor's best-resolution selection.

All of this is static per image (shapes must be known before the vision
jit compiles), so it runs on the host in the Processor and is replayed
inside the model with the same arithmetic.
"""

from typing import List, Sequence, Tuple


def select_best_resolution(orig_hw: Tuple[int, int],
                           pinpoints: Sequence[Sequence[int]]
                           ) -> Tuple[int, int]:
    """HF ``select_best_resolution``: maximize effective resolution,
    tie-break on least wasted area. ``pinpoints`` entries are [h, w]."""
    oh, ow = orig_hw
    best = None
    max_eff = 0
    min_waste = float("inf")
    for h, w in pinpoints:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste, best = eff, waste, (h, w)
    return best


def anyres_grid_shape(orig_hw: Tuple[int, int],
                      pinpoints: Sequence[Sequence[int]],
                      vision_size: int) -> Tuple[int, int]:
    """(num_patch_h, num_patch_w) of vision_size-sized crops covering
    the selected best resolution (HF get_anyres_image_grid_shape)."""
    bh, bw = select_best_resolution(orig_hw, pinpoints)
    return bh // vision_size, bw // vision_size


def unpad_slices(orig_hw: Tuple[int, int],
                 cur_hw: Tuple[int, int]) -> Tuple[slice, slice]:
    """Row/col slices removing the aspect-ratio padding from a
    [rows, cols] feature grid (HF ``unpad_image``, exact rounding)."""
    oh, ow = orig_hw
    ch, cw = cur_hw
    orig_ar = ow / oh
    cur_ar = cw / ch
    if orig_ar > cur_ar:
        scale = cw / ow
        new_h = int(round(oh * scale, 7))
        pad = (ch - new_h) // 2
        return slice(pad, ch - pad), slice(0, cw)
    new_w = int(round(ow * (ch / oh), 7))
    pad = (cw - new_w) // 2
    return slice(0, ch), slice(pad, cw - pad)


def feature_grid_dims(orig_hw: Tuple[int, int],
                      pinpoints: Sequence[Sequence[int]],
                      vision_size: int,
                      patch_size: int) -> Tuple[int, int, int, int]:
    """(num_patch_h, num_patch_w, rows, cols) of the unpadded spatial
    feature grid in patch cells."""
    nph, npw = anyres_grid_shape(orig_hw, pinpoints, vision_size)
    side = vision_size // patch_size
    rs, cs = unpad_slices(orig_hw, (nph * side, npw * side))
    return nph, npw, rs.stop - rs.start, cs.stop - cs.start


def feature_span(orig_hw: Tuple[int, int],
                 pinpoints: Sequence[Sequence[int]],
                 vision_size: int, patch_size: int,
                 select_strategy: str = "default") -> int:
    """Total spliced token count: base crop + unpadded spatial grid with
    one image_newline per row (HF pack_image_features)."""
    side = vision_size // patch_size
    base = side * side + (0 if select_strategy == "default" else 1)
    _, _, rows, cols = feature_grid_dims(orig_hw, pinpoints,
                                         vision_size, patch_size)
    return base + rows * (cols + 1)
