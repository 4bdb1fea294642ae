"""Pallas flash attention (forward) for long-sequence ViT inference.

The reference's only long-sequence lever is ViTDet windowed attention
(SURVEY.md 5.7); dense grids at stride 4 (make_video_demo.py: up to ~26k
tokens) run quadratic SDPA. This kernel computes attention with the
streaming softmax so the (N x N) score matrix never materializes in HBM:
memory O(N * head_dim) instead of O(N^2).

Status: forward-only, used for inference paths (the video demo, eval
feature extraction). Training still uses ops in vit.sdpa (XLA fuses the
backward well at stage-3 sequence lengths). Tile sizes follow the TPU
tiling constraints (multiples of 128 lanes); sequences are padded to the
block size by the wrapper.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, seq_len: int,
                  scale: float):
    """Grid: (num_q_blocks,). Full K/V are resident per q-block."""
    q = q_ref[:].astype(jnp.float32) * scale  # (bq, d)
    bq = q.shape[0]
    d = q.shape[1]

    num_k_blocks = pl.cdiv(seq_len, block_k)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        # mask out-of-range keys (padding)
        kpos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        s = jnp.where(kpos < seq_len, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc, m0, l0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_one_head(q, k, v, block_q: int, block_k: int, interpret: bool):
    seq_len, d = q.shape
    pad_q = (-seq_len) % block_q
    pad_k = (-seq_len) % block_k
    qp = jnp.pad(q, ((0, pad_q), (0, 0)))
    kp = jnp.pad(k, ((0, pad_k), (0, 0)))
    vp = jnp.pad(v, ((0, pad_k), (0, 0)))
    scale = 1.0 / math.sqrt(d)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, seq_len=seq_len, scale=scale
        ),
        grid=(qp.shape[0] // block_q,),
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp.shape[0], d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vp.shape[0], d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:seq_len]


def flash_attention(q: Array, k: Array, v: Array,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False) -> Array:
    """(B, N, H, D) attention with streaming softmax.

    Drop-in for vit.sdpa's contraction (no mask support; ViT is dense
    bidirectional). ``interpret=True`` runs the Pallas interpreter (CPU
    testing).
    """
    f = functools.partial(
        _flash_one_head, block_q=block_q, block_k=block_k, interpret=interpret
    )
    b, n, h, d = q.shape

    def flat(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    out = jax.vmap(f)(flat(q), flat(k), flat(v))
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
