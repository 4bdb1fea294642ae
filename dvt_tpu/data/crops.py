"""Random-resized-crop views with patch-center coordinates, rendered ON DEVICE.

The reference's stage-1 pipeline (dvt/dataset/transform.py, single_image_
dataset.py) runs torchvision's RandomResizedCrop + bicubic resize on the host
for all 768 views and ships each 518x518x3 view over PCIe. TPU-first design:
only crop *parameters* are sampled on the host (a few ints per view); the
base image is uploaded once, and the bicubic crop-resize runs on the TPU as
two separable 4-tap cubic gathers - static shapes, vmapped over views, and
fusable into the same XLA program as the ViT feature extraction. Host->device
traffic drops from 768 views to 1 image.

Numerics match torchvision's ``F.resized_crop(..., BICUBIC, antialias=True)``
(the pillow-style Keys A=-0.5 kernel with truncated+renormalized border
windows). Stage-1 crops (scale=(0.1, 0.5) of a 518px base) always upscale,
where the static 4-tap budget is exact; pass a larger ``max_taps`` for
downscaling crops.

Coordinate semantics (transform.py:54-73): each view carries the normalized
patch-center grid of its crop in the base image at feature resolution
((S - P)/stride + 1 per side); horizontal flips mirror both the pixels and
the x-coordinates about the crop's x-extent.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

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


def _cubic_keys(d: Array, a: float = -0.5) -> Array:
    """Keys cubic kernel (A=-0.5): torch/pillow's antialiased bicubic."""
    d = jnp.abs(d)
    d2 = d * d
    d3 = d2 * d
    near = (a + 2.0) * d3 - (a + 3.0) * d2 + 1.0  # |d| <= 1
    far = a * d3 - 5.0 * a * d2 + 8.0 * a * d - 4.0 * a  # 1 < |d| < 2
    return jnp.where(d <= 1.0, near, jnp.where(d < 2.0, far, 0.0))


def _axis_taps(start: Array, size: Array, out_size: int, limit: int,
               max_taps: int = 4):
    """Source indices (out, T) and weights (out, T) for one axis of a
    crop-resize: crop [start, start+size) -> out_size samples.

    Implements torch's ``_upsample_bicubic2d_aa``: Keys A=-0.5 kernel,
    pillow window [int(c - support + 0.5), int(c + support + 0.5)) truncated
    at the crop borders and renormalized; support widens with the scale when
    minifying. ``max_taps`` is the static tap budget: 4 suffices whenever
    scale <= 1 (stage-1 crops always upscale); pass ceil(4*scale)+2 for
    downscaling crops.
    """
    scale = size.astype(jnp.float32) / out_size
    ss = jnp.maximum(scale, 1.0)  # support_scale
    support = 2.0 * ss
    o = jnp.arange(out_size, dtype=jnp.float32)
    cc = (o + 0.5) * scale  # in-crop center, pillow convention
    # pillow: lo = int(cc - support + 0.5) with C truncation; cc - support
    # + 0.5 >= -support so truncation == where(neg, ceil, floor)
    lo_f = cc - support + 0.5
    lo_win = jnp.where(lo_f >= 0, jnp.floor(lo_f), jnp.ceil(lo_f)).astype(jnp.int32)
    hi_win = jnp.floor(cc + support + 0.5).astype(jnp.int32)  # always >= 0
    lo_win_c = jnp.maximum(lo_win, 0)
    hi_win_c = jnp.minimum(hi_win, size.astype(jnp.int32))
    offs = jnp.arange(max_taps, dtype=jnp.int32)
    idx_rel = lo_win_c[:, None] + offs[None, :]  # (out, T)
    d = (idx_rel.astype(jnp.float32) - cc[:, None] + 0.5) / ss
    w = _cubic_keys(d)
    valid = idx_rel < hi_win_c[:, None]
    w = jnp.where(valid, w, 0.0)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    lo = start.astype(jnp.int32)
    idx = jnp.clip(idx_rel, 0, size.astype(jnp.int32) - 1) + lo
    idx = jnp.minimum(idx, limit - 1)
    return idx, w


def render_one_crop(base: Array, box: Array, flip: Array,
                    out_hw: Tuple[int, int], max_taps: int = 4) -> Array:
    """Bicubic crop-resize of (H, W, C) ``base`` to ``out_hw``.

    box: (4,) int32 (top, left, h, w); flip: () bool.
    Two separable cubic passes, expressed as gathers + weighted sums.
    """
    H, W, C = base.shape
    oh, ow = out_hw
    top, left, h, w = box[0], box[1], box[2], box[3]

    # precision pinned: TPU default matmul precision rounds fp32 operands
    # to bf16, which would break the torch-exact bicubic claim on device
    # (CLAUDE.md; ops/resample.py pins its einsums the same way)
    ridx, rw = _axis_taps(top, h, oh, H, max_taps)  # (oh,T)
    rows = base[ridx]  # (oh, T, W, C)
    tmp = jnp.einsum("ok,okwc->owc", rw, rows, precision="highest")

    cidx, cw = _axis_taps(left, w, ow, W, max_taps)  # (ow,T)
    cols = tmp[:, cidx]  # (oh, ow, T, C)
    out = jnp.einsum("ok,hokc->hoc", cw, cols, precision="highest")
    return jnp.where(flip, out[:, ::-1, :], out)


@partial(jax.jit, static_argnames=("out_hw", "max_taps"))
def render_crops(base: Array, boxes: Array, flips: Array,
                 out_hw: Tuple[int, int], max_taps: int = 4) -> Array:
    """(V, out_h, out_w, C) views from one base image; vmapped on device."""
    return jax.vmap(
        lambda b, f: render_one_crop(base, b, f, out_hw, max_taps)
    )(boxes, flips)


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
