"""Non-overlapping window partition/unpartition for windowed attention.

TPU rebuild of the ViTDet helpers the reference ships in
evaluation/vitdet/vision_transformer.py:24-66: pad a (B, H, W, C) map to
window multiples, tile into (B*nW, window, window, C), and invert. Static
window sizes keep every shape fixed under jit.
"""

from __future__ import annotations

from typing import Tuple

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
