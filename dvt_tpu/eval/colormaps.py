"""Class palettes + painted segmentation maps.

Counterpart of the reference's evaluation/segmentation/utils/colormaps.py
(362 lines of inline palette constants). The PASCAL VOC palette is generated
by the official bit-interleaving algorithm (identical colors to the
constants the reference inlines). For ADE20k we extend the same generator to
150 entries instead of checking in the official constant table - palette
colors are visualization cosmetics only; metrics never touch them
(documented deviation).
"""

from __future__ import annotations

import numpy as np


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
    """150-entry palette via the same generator (offset to skip background)."""
    return voc_palette(n + 1)[1:]


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
