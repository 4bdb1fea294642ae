"""Strided patch embedding as im2col + matmul.

The reference overrides the patch-embed conv stride (vit_wrapper.py:78-79),
producing overlapping patches (stride < kernel). Instead of a strided conv,
we tile the image at g = gcd(patch, stride) granularity with static slices
and assemble the (B, gh, gw, P*P*3) window tensor, then hit the MXU with one
large matmul. This is exact data movement (no low-precision conv lowering),
compiles fast, and turns the embedding into the kind of big batched matmul
TPUs are built for.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def extract_patches(x: Array, patch: int, stride: int) -> Array:
    """(B, H, W, C) -> (B, gh, gw, patch*patch*C) overlapping windows.

    gh = (H - patch) // stride + 1 (VALID; reference dynamic_feat_size
    semantics, vit_wrapper.py:81-91).
    """
    b, h, w, c = x.shape
    gh = (h - patch) // stride + 1
    gw = (w - patch) // stride + 1
    g = math.gcd(patch, stride)
    k = patch // g  # subtiles per patch side
    step = stride // g  # patch pitch in tile units

    # crop to the pixels VALID conv would read, in whole tiles
    need_h = (gh - 1) * stride + patch
    need_w = (gw - 1) * stride + patch
    x = x[:, :need_h, :need_w, :]
    mh, mw = need_h // g, need_w // g
    tiles = x.reshape(b, mh, g, mw, g, c)

    # separable assembly: k strided slices along H, then k along W -
    # 2k ops instead of k^2 (k = patch // gcd hits 16 at the default
    # stride 7 on patch-16 models, where k^2 = 256 slice+stack ops
    # bloated the traced graph)
    rows = jnp.stack([
        tiles[:, u : u + (gh - 1) * step + 1 : step]
        for u in range(k)
    ], axis=2)  # (B, gh, k, g, mw, g, C)
    rows = rows.reshape(b, gh, patch, mw, g, c)
    cols = jnp.stack([
        rows[:, :, :, v : v + (gw - 1) * step + 1 : step]
        for v in range(k)
    ], axis=4)  # (B, gh, patch, gw, k, g, C)
    win = cols.reshape(b, gh, patch, gw, patch, c)
    win = jnp.moveaxis(win, 2, 3)  # (B, gh, gw, ph, pw, C)
    return win.reshape(b, gh, gw, patch * patch * c)


def patch_embed(x: Array, kernel: Array, bias: Array | None, stride: int,
                precision=None, out_dtype=None) -> Array:
    """Apply a conv-layout (P, P, C, D) kernel as im2col + matmul.

    ``bias=None`` skips the bias add (timm pre-norm/CLIP models have no
    patch-embed bias)."""
    p = kernel.shape[0]
    windows = extract_patches(x, p, stride)
    d = kernel.shape[-1]
    wmat = kernel.reshape(-1, d)
    if out_dtype is not None:
        windows = windows.astype(out_dtype)
        wmat = wmat.astype(out_dtype)
        if bias is not None:
            bias = bias.astype(out_dtype)
    out = jax.lax.dot_general(
        windows, wmat,
        dimension_numbers=(((3,), (0,)), ((), ())),
        precision=precision,
    )
    return out if bias is None else out + bias
