"""Absolute position-embedding resampling with torch-exact bicubic.

Replicates the semantics of timm's ``resample_abs_pos_embed`` (used by the
reference at dvt/models/online_denoiser.py:90 and inside every timm ViT
forward with ``dynamic_img_size=True``): split off prefix tokens, bicubic-
resize the spatial grid with half-pixel centers (align_corners=False) and
antialiasing, and re-concatenate.

torch's bicubic kernel uses A=-0.75 (vs. the Keys A=-0.5 kernel in
``jax.image.resize``), and its ``antialias=True`` widens the kernel support
by the scale factor on downsampling. Because all sizes are static under jit,
we precompute the separable 1-D resampling weights with NumPy at trace time
and express the resize as two dense matmuls - constants folded into the
graph, MXU-friendly, and bit-matching torch's ``F.interpolate(...,
mode="bicubic", antialias=True)`` to float rounding.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


@lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, antialias: bool) -> np.ndarray:
    """(out_size, in_size) bicubic interpolation weights.

    antialias=True mirrors torch's ``_upsample_bicubic2d_aa`` (the
    pillow-derived algorithm: Keys kernel with A=-0.5, window truncated at
    the borders and renormalized, kernel widened by the scale when
    minifying - and dispatched for upsampling too).
    antialias=False mirrors plain ``upsample_bicubic2d`` (A=-0.75, 4 taps
    around the source point, edge-clamped index accumulation).
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if antialias:
        support_scale = max(scale, 1.0)
        support = 2.0 * support_scale
        for i in range(out_size):
            center = (i + 0.5) * scale
            xmin = max(int(center - support + 0.5), 0)
            xmax = min(int(center + support + 0.5), in_size)
            js = np.arange(xmin, xmax)
            w = _cubic((js - center + 0.5) / support_scale, a=-0.5)
            s = w.sum()
            if s != 0:
                w = w / s
            mat[i, xmin:xmax] = w
    else:
        for i in range(out_size):
            src = (i + 0.5) * scale - 0.5
            f = math.floor(src)
            t = src - f
            js = np.array([f - 1, f, f + 1, f + 2])
            w = _cubic(js - src)
            js = np.clip(js, 0, in_size - 1)
            for j, wj in zip(js, w):
                mat[i, j] += wj
    return mat.astype(np.float32)


def bicubic_resize_2d(x: jax.Array, out_hw: Tuple[int, int],
                      antialias: bool = True) -> jax.Array:
    """Resize (..., H, W, C) to (..., H', W', C), torch-bicubic semantics."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    wh = jnp.asarray(_resize_matrix(h, oh, antialias))
    ww = jnp.asarray(_resize_matrix(w, ow, antialias))
    x = jnp.einsum("oh,...hwc->...owc", wh, x, precision="highest")
    x = jnp.einsum("ow,...hwc->...hoc", ww, x, precision="highest")
    return x


def resample_abs_pos_embed(
    pos_embed: jax.Array,
    new_size: Tuple[int, int],
    old_size: Optional[Tuple[int, int]] = None,
    num_prefix_tokens: int = 1,
) -> jax.Array:
    """Resample a (1, N, C) absolute pos embed to a new spatial grid.

    Args:
      pos_embed: (1, num_prefix_tokens + H*W, C) table.
      new_size: target (H', W') grid.
      old_size: source (H, W) grid; inferred as square if omitted.
      num_prefix_tokens: number of leading non-spatial tokens kept as-is.

    Returns:
      (1, num_prefix_tokens + H'*W', C) resampled table (same dtype).
    """
    num_pos = pos_embed.shape[1] - num_prefix_tokens
    if old_size is None:
        side = int(math.isqrt(num_pos))
        if side * side != num_pos:
            raise ValueError(f"cannot infer square grid from {num_pos} tokens")
        old_size = (side, side)
    if tuple(old_size) == tuple(new_size):
        return pos_embed

    prefix = pos_embed[:, :num_prefix_tokens]
    grid = pos_embed[:, num_prefix_tokens:]
    orig_dtype = grid.dtype

    c = grid.shape[-1]
    grid = grid.reshape(1, old_size[0], old_size[1], c).astype(jnp.float32)
    grid = bicubic_resize_2d(grid, tuple(new_size), antialias=True)
    grid = grid.reshape(1, new_size[0] * new_size[1], c).astype(orig_dtype)
    if num_prefix_tokens:
        return jnp.concatenate([prefix, grid], axis=1)
    return grid
