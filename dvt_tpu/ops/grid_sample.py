"""Bilinear 2-D grid sampling.

Equivalent of ``torch.nn.functional.grid_sample(..., mode="bilinear",
align_corners=True, padding_mode="zeros")`` as used by the reference's
SingleImageDenoiser to sample the shared-artifact map at view coordinates
(dvt/models/offline_denoiser.py:96-101).

Written as dense gathers so it vmaps cleanly over many per-image artifact
maps and lowers to XLA gathers the TPU handles well (the sample counts here
are a few thousand points per step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_2d(
    image: jax.Array,
    coords: jax.Array,
    align_corners: bool = True,
) -> jax.Array:
    """Sample ``image`` at normalized ``coords`` with bilinear interpolation.

    Args:
      image: (H, W, C) feature map.
      coords: (..., 2) sampling locations in [-1, 1], ordered (x, y) like
        torch's grid_sample.
      align_corners: if True, -1/1 map to the centers of the corner pixels.

    Returns:
      (..., C) sampled features. Out-of-range samples are zero-padded.
    """
    h, w, c = image.shape
    x = coords[..., 0]
    y = coords[..., 1]

    if align_corners:
        fx = (x + 1.0) * 0.5 * (w - 1)
        fy = (y + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((x + 1.0) * w - 1.0) * 0.5
        fy = ((y + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        vals = image[yi, xi]  # advanced indexing -> XLA gather
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy
