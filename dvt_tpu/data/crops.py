"""Random-resized-crop views with patch-center coordinates, rendered ON DEVICE.

The reference's stage-1 pipeline (dvt/dataset/transform.py, single_image_
dataset.py) runs torchvision's RandomResizedCrop + bicubic resize on the host
for all 768 views and ships each 518x518x3 view over PCIe. TPU-first design:
only crop *parameters* are sampled on the host (a few ints per view); the
base image is uploaded once, and the bicubic crop-resize runs on the TPU as
two separable 4-tap cubic gathers - static shapes, vmapped over views, and
fusable into the same XLA program as the ViT feature extraction. Host->device
traffic drops from 768 views to 1 image.

Numerics match torchvision's ``F.resized_crop(..., BICUBIC)`` for the
upscaling case (A=-0.75 kernel, half-pixel centers). Stage-1 crops
(scale=(0.1, 0.5) of a 518px base) always upscale, so the antialias flag is
moot; downscaling crops would need kernel widening (documented limitation).

Coordinate semantics (transform.py:54-73): each view carries the normalized
patch-center grid of its crop in the base image at feature resolution
((S - P)/stride + 1 per side); horizontal flips mirror both the pixels and
the x-coordinates about the crop's x-extent.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass
class CropSampler:
    """Host-side sampling of RandomResizedCrop boxes (torchvision get_params
    semantics: 10 attempts in scale/log-ratio space, center-crop fallback)."""

    height: int
    width: int
    scale: Tuple[float, float] = (0.1, 0.5)
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
    horizontal_flip: bool = True
    seed: int = 0

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    def sample(self, num_views: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns boxes (N, 4) int32 rows (top, left, h, w) and flip (N,) bool."""
        boxes = np.empty((num_views, 4), np.int32)
        H, W = self.height, self.width
        area = H * W
        log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        for n in range(num_views):
            for _ in range(10):
                target_area = area * self._rng.uniform(*self.scale)
                aspect = math.exp(self._rng.uniform(*log_ratio))
                w = int(round(math.sqrt(target_area * aspect)))
                h = int(round(math.sqrt(target_area / aspect)))
                if 0 < w <= W and 0 < h <= H:
                    i = self._rng.integers(0, H - h + 1)
                    j = self._rng.integers(0, W - w + 1)
                    boxes[n] = (i, j, h, w)
                    break
            else:
                # fallback: clamp aspect, center crop
                in_ratio = W / H
                if in_ratio < self.ratio[0]:
                    w, h = W, int(round(W / self.ratio[0]))
                elif in_ratio > self.ratio[1]:
                    h, w = H, int(round(H * self.ratio[1]))
                else:
                    w, h = W, H
                boxes[n] = ((H - h) // 2, (W - w) // 2, h, w)
        flips = (
            self._rng.random(num_views) < 0.5
            if self.horizontal_flip
            else np.zeros(num_views, bool)
        )
        return boxes, flips


def _cubic_weights(t: Array, a: float = -0.75) -> Array:
    """4-tap cubic convolution weights for fractional offset t in [0,1).

    Taps at offsets (-1, 0, 1, 2) relative to floor(src). Matches torch's
    bicubic kernel (A=-0.75). t: (...,) -> (..., 4).
    """
    d = jnp.stack([t + 1.0, t, 1.0 - t, 2.0 - t], axis=-1)
    d2 = d * d
    d3 = d2 * d
    near = (a + 2.0) * d3 - (a + 3.0) * d2 + 1.0  # |d| <= 1
    far = a * d3 - 5.0 * a * d2 + 8.0 * a * d - 4.0 * a  # 1 < |d| < 2
    return jnp.where(d <= 1.0, near, far)


def _axis_taps(start: Array, size: Array, out_size: int, limit: int):
    """Source indices (out, 4) and weights (out, 4) for one axis of a
    crop-resize: crop [start, start+size) -> out_size samples."""
    scale = size.astype(jnp.float32) / out_size
    o = jnp.arange(out_size, dtype=jnp.float32)
    src = start.astype(jnp.float32) + (o + 0.5) * scale - 0.5
    f = jnp.floor(src)
    t = src - f
    w = _cubic_weights(t)  # (out, 4)
    base = f.astype(jnp.int32)
    idx = base[:, None] + jnp.array([-1, 0, 1, 2], jnp.int32)[None, :]
    lo = start.astype(jnp.int32)
    hi = lo + size.astype(jnp.int32) - 1
    idx = jnp.clip(idx, lo, jnp.minimum(hi, limit - 1))
    return idx, w


def render_one_crop(base: Array, box: Array, flip: Array,
                    out_hw: Tuple[int, int]) -> Array:
    """Bicubic crop-resize of (H, W, C) ``base`` to ``out_hw``.

    box: (4,) int32 (top, left, h, w); flip: () bool.
    Two separable 4-tap cubic passes, expressed as gathers + weighted sums.
    """
    H, W, C = base.shape
    oh, ow = out_hw
    top, left, h, w = box[0], box[1], box[2], box[3]

    ridx, rw = _axis_taps(top, h, oh, H)  # (oh,4)
    rows = base[ridx]  # (oh, 4, W, C)
    tmp = jnp.einsum("ok,okwc->owc", rw, rows)

    cidx, cw = _axis_taps(left, w, ow, W)  # (ow,4)
    cols = tmp[:, cidx]  # (oh, ow, 4, C)
    out = jnp.einsum("ok,ohkc->ohc", cw, jnp.moveaxis(cols, 1, 0))
    out = jnp.moveaxis(out, 0, 1)  # back to (oh, ow, C)
    return jnp.where(flip, out[:, ::-1, :], out)


@partial(jax.jit, static_argnames=("out_hw",))
def render_crops(base: Array, boxes: Array, flips: Array,
                 out_hw: Tuple[int, int]) -> Array:
    """(V, out_h, out_w, C) views from one base image; vmapped on device."""
    return jax.vmap(lambda b, f: render_one_crop(base, b, f, out_hw))(
        boxes, flips
    )


@partial(jax.jit, static_argnames=("feat_hw", "base_hw"))
def view_coordinate_grids(boxes: Array, flips: Array,
                          feat_hw: Tuple[int, int],
                          base_hw: Tuple[int, int]) -> Array:
    """Normalized patch-center coordinate grids, (V, fh, fw, 2), (x, y) order.

    Matches RandomResizedCropFlip (transform.py:54-73): linspace over the
    crop's normalized extent at feature resolution; x mirrored on flip.
    """
    fh, fw = feat_hw
    H, W = base_hw

    def one(box, flip):
        top, left, h, w = (box[i].astype(jnp.float32) for i in range(4))
        ni, nj = top / H, left / W
        nh, nw = h / H, w / W
        ys = jnp.linspace(0.0, 1.0, fh) * nh + ni
        xs = jnp.linspace(0.0, 1.0, fw) * nw + nj
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        gx = jnp.where(flip, (gx.max() - gx) + gx.min(), gx)
        return jnp.stack([gx, gy], axis=-1)

    return jax.vmap(one)(boxes, flips)
