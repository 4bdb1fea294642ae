"""ViTDet adapter components: windowed attention + SimpleFPN.

TPU rebuild of evaluation/vitdet/: the detection eval runs a plain ViT
backbone with (a) per-block windowed attention to bound cost
(vision_transformer.py:24-117) and (b) a simple feature pyramid built from
the single-scale map (simple_fpn.py:97-205) with channel LayerNorm (LN2d)
and fixed 2-D sin-cos position embeddings (:26-73).

Everything here is functional on (B, H, W, C) maps; static window sizes keep
XLA shapes fixed.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


# shared with the backbone's windowed-attention mode (models/vit.py)
from dvt_tpu.ops.windows import window_partition, window_unpartition  # noqa: E402,F401


def windowed_attention(q_fn, x: Array, window: int) -> Array:
    """Apply an attention callable over non-overlapping windows of a
    (B, H, W, C) map (vision_transformer.py:98-117 forward pattern)."""
    h, w = x.shape[1:3]
    wins, padded = window_partition(x, window)
    n = window * window
    out = q_fn(wins.reshape(wins.shape[0], n, wins.shape[-1]))
    out = out.reshape(-1, window, window, out.shape[-1])
    return window_unpartition(out, window, padded, (h, w))


def sincos_pos_embed_2d(embed_dim: int, h: int, w: int,
                        temperature: float = 10000.0) -> Array:
    """Fixed 2-D sin-cos table (simple_fpn.py:26-73), (h*w, embed_dim)."""
    assert embed_dim % 4 == 0
    pe_dim = embed_dim // 4
    omega = jnp.arange(pe_dim, dtype=jnp.float32) / pe_dim
    omega = 1.0 / (temperature**omega)
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    out_y = ys.reshape(-1)[:, None] * omega[None]
    out_x = xs.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate(
        [jnp.sin(out_x), jnp.cos(out_x), jnp.sin(out_y), jnp.cos(out_y)],
        axis=1,
    )


class LN2d(nn.Module):
    """Channel-wise LayerNorm on (B, H, W, C) (simple_fpn.py:76-94)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + self.eps) * scale + bias


class SimpleFPN(nn.Module):
    """ViTDet simple feature pyramid (simple_fpn.py:97-205): from one
    C-channel stride-16 map produce 4 scales (stride 4, 8, 16, 32) via
    deconv x2 / identity / maxpool, then lateral 1x1 + 3x3 convs with LN2d.
    NHWC; returns coarsest-last list."""

    out_channels: int = 256
    # The _pe config variant (vitb_voc2012_vitdet_pe_config.py:72-73:
    # add_pe=True, num_patches=1369): add a FIXED 2-D sin-cos position
    # embedding - built once at the pe_grid x pe_grid training grid, then
    # bicubic-resampled to the runtime map (simple_fpn.py:121-129, 181-186
    # with timm resample_abs_pos_embed) - to the backbone map before
    # building the pyramid.
    add_pe: bool = False
    pe_grid: int = 37

    @nn.compact
    def __call__(self, x: Array) -> Sequence[Array]:
        c = x.shape[-1]
        if self.add_pe:
            from dvt_tpu.ops.resample import resample_abs_pos_embed

            h, w = x.shape[1:3]
            pe = sincos_pos_embed_2d(c, self.pe_grid, self.pe_grid)[None]
            pe = resample_abs_pos_embed(
                pe, (h, w), (self.pe_grid, self.pe_grid),
                num_prefix_tokens=0)
            x = x + pe.reshape(1, h, w, c).astype(x.dtype)

        def lateral(y, name):
            y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        name=f"{name}_lateral")(y)
            y = LN2d(name=f"{name}_lateral_norm")(y)
            y = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        use_bias=False, name=f"{name}_output")(y)
            y = LN2d(name=f"{name}_output_norm")(y)
            return y

        # stride 4: two stacked 2x deconvs with LN+GELU between
        up4 = nn.ConvTranspose(c // 2, (2, 2), strides=(2, 2), name="up4_1")(x)
        up4 = LN2d(name="up4_norm")(up4)
        up4 = nn.gelu(up4)
        up4 = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), name="up4_2")(up4)
        # stride 8: one 2x deconv
        up8 = nn.ConvTranspose(c // 2, (2, 2), strides=(2, 2), name="up8")(x)
        # stride 16: identity; stride 32: 2x maxpool
        down32 = nn.max_pool(x, (2, 2), strides=(2, 2))

        return [
            lateral(up4, "p2"),
            lateral(up8, "p3"),
            lateral(x, "p4"),
            lateral(down32, "p5"),
        ]
