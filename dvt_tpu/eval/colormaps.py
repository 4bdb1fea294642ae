"""Class palettes + painted segmentation maps.

Counterpart of the reference's evaluation/segmentation/utils/colormaps.py
(362 lines of inline palette constants). The PASCAL VOC palette is generated
by the official bit-interleaving algorithm (identical colors to the
constants the reference inlines). The ADE20k palette is the official
150-class color table (colormaps.py:6-160; the same constants ship in
mmseg/detectron2) — pure data constants, stored flat below so painted
--save_maps output matches reference/mmseg-painted maps pixel-for-pixel.
"""

from __future__ import annotations

import numpy as np

# Official ADE20K colors (reference colormaps.py:6-160), flattened RGB.
# Row 0 is the (0,0,0) background/ignore entry; the 150 class colors
# follow. Data constants, not code.
_ADE20K_FLAT = (
    0, 0, 0, 120, 120, 120, 180, 120, 120, 6, 230, 230, 80, 50, 50, 4, 200,
    3, 120, 120, 80, 140, 140, 140, 204, 5, 255, 230, 230, 230, 4, 250, 7,
    224, 5, 255, 235, 255, 7, 150, 5, 61, 120, 120, 70, 8, 255, 51, 255, 6,
    82, 143, 255, 140, 204, 255, 4, 255, 51, 7, 204, 70, 3, 0, 102, 200, 61,
    230, 250, 255, 6, 51, 11, 102, 255, 255, 7, 71, 255, 9, 224, 9, 7, 230,
    220, 220, 220, 255, 9, 92, 112, 9, 255, 8, 255, 214, 7, 255, 224, 255,
    184, 6, 10, 255, 71, 255, 41, 10, 7, 255, 255, 224, 255, 8, 102, 8, 255,
    255, 61, 6, 255, 194, 7, 255, 122, 8, 0, 255, 20, 255, 8, 41, 255, 5,
    153, 6, 51, 255, 235, 12, 255, 160, 150, 20, 0, 163, 255, 140, 140, 140,
    250, 10, 15, 20, 255, 0, 31, 255, 0, 255, 31, 0, 255, 224, 0, 153, 255,
    0, 0, 0, 255, 255, 71, 0, 0, 235, 255, 0, 173, 255, 31, 0, 255, 11, 200,
    200, 255, 82, 0, 0, 255, 245, 0, 61, 255, 0, 255, 112, 0, 255, 133, 255,
    0, 0, 255, 163, 0, 255, 102, 0, 194, 255, 0, 0, 143, 255, 51, 255, 0, 0,
    82, 255, 0, 255, 41, 0, 255, 173, 10, 0, 255, 173, 255, 0, 0, 255, 153,
    255, 92, 0, 255, 0, 255, 255, 0, 245, 255, 0, 102, 255, 173, 0, 255, 0,
    20, 255, 184, 184, 0, 31, 255, 0, 255, 61, 0, 71, 255, 255, 0, 204, 0,
    255, 194, 0, 255, 82, 0, 10, 255, 0, 112, 255, 51, 0, 255, 0, 194, 255,
    0, 122, 255, 0, 255, 163, 255, 153, 0, 0, 255, 10, 255, 112, 0, 143,
    255, 0, 82, 0, 255, 163, 255, 0, 255, 235, 0, 8, 184, 170, 133, 0, 255,
    0, 255, 92, 184, 0, 255, 255, 0, 31, 0, 184, 255, 0, 214, 255, 255, 0,
    112, 92, 255, 0, 0, 224, 255, 112, 224, 255, 70, 184, 160, 163, 0, 255,
    153, 0, 255, 71, 255, 0, 255, 0, 163, 255, 204, 0, 255, 0, 143, 0, 255,
    235, 133, 255, 0, 255, 0, 235, 245, 0, 255, 255, 0, 122, 255, 245, 0,
    10, 190, 212, 214, 255, 0, 0, 204, 255, 20, 0, 255, 255, 255, 0, 0, 153,
    255, 0, 41, 255, 0, 255, 204, 41, 0, 255, 41, 255, 0, 173, 0, 255, 0,
    245, 255, 71, 0, 255, 122, 0, 255, 0, 255, 184, 0, 92, 255, 184, 255, 0,
    0, 133, 255, 255, 214, 0, 25, 194, 194, 102, 255, 0, 92, 0, 255,
)


def voc_palette(n: int = 21) -> np.ndarray:
    """Official PASCAL VOC colormap: bit-reversal RGB generator. (n, 3) u8."""
    pal = np.zeros((n, 3), np.uint8)
    for i in range(n):
        c, r, g, b = i, 0, 0, 0
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        pal[i] = (r, g, b)
    return pal


def ade20k_palette(n: int = 150) -> np.ndarray:
    """Official ADE20k class palette (reference colormaps.py:6-160).

    Returns the n CLASS colors, i.e. rows 1..n of the 151-row table -
    ADE20k's label 0 after reduce_zero_label is class 'wall' which the
    official table paints (120, 120, 120); the leading (0, 0, 0) row is
    the background/ignore entry painted separately by paint_label_map."""
    table = np.asarray(_ADE20K_FLAT, np.uint8).reshape(-1, 3)
    return table[1:n + 1]


def palette_for(task: str) -> np.ndarray:
    if task.startswith("voc"):
        return voc_palette()
    if task.startswith("ade"):
        return ade20k_palette()
    return voc_palette(256)


def paint_label_map(label: np.ndarray, palette: np.ndarray,
                    ignore_index: int = 255) -> np.ndarray:
    """(H, W) int labels -> (H, W, 3) uint8; ignore_index painted black."""
    lab = np.asarray(label, np.int64)
    out = np.zeros((*lab.shape, 3), np.uint8)
    valid = (lab >= 0) & (lab < len(palette)) & (lab != ignore_index)
    out[valid] = palette[lab[valid]]
    return out


def overlay(img: np.ndarray, painted: np.ndarray,
            alpha: float = 0.5, float_range: float = None) -> np.ndarray:
    """Blend a painted label map over an (H, W, 3) uint8/float image.

    Float contract mirrors data/single_image.load_image: floats are
    assumed [0, 1] unless ``float_range=255.0`` is passed explicitly -
    with ``float_range=None`` the scale is inferred from ``max()``, which
    misclassifies a legitimately near-black 0-255 image."""
    base = np.asarray(img, np.float32)
    if np.issubdtype(np.asarray(img).dtype, np.floating):
        if float_range is None:
            float_range = 1.0 if base.max() <= 1.0 + 1e-6 else 255.0
        base = base * (255.0 / float_range)
    mix = (1 - alpha) * base + alpha * painted.astype(np.float32)
    return np.clip(mix, 0, 255).astype(np.uint8)
