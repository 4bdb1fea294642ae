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


def window_partition(x: Array, window: int) -> Tuple[Array, Tuple[int, int]]:
    """(B, H, W, C) -> (B*nW, window, window, C), padding to multiples."""
    b, h, w, c = x.shape
    ph = (window - h % window) % window
    pw = (window - w % window) % window
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(x: Array, window: int, padded_hw: Tuple[int, int],
                       hw: Tuple[int, int]) -> Array:
    hp, wp = padded_hw
    h, w = hw
    b = x.shape[0] // (hp // window * (wp // window))
    x = x.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


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

    @nn.compact
    def __call__(self, x: Array) -> Sequence[Array]:
        c = x.shape[-1]

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
