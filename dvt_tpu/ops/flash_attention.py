"""Pallas flash attention (forward + backward) for long-sequence ViTs.

The reference's only long-sequence lever is ViTDet windowed attention
(SURVEY.md 5.7); dense grids at stride 4 (make_video_demo.py: up to ~26k
tokens) run quadratic SDPA. This kernel computes attention with the
streaming softmax so the (N x N) score matrix never materializes in HBM:
memory O(N * head_dim) instead of O(N^2).

Layout: one (seq, head_dim) problem per grid; batch x heads is vmapped
(pallas_call's batching rule prepends a grid dimension). The 2-D grid
(q_blocks, k_blocks) streams K/V blocks through the pipeline while the
softmax running state lives in VMEM scratch, so the full K/V never has to
be VMEM-resident - sequences are bounded by HBM, not VMEM.

Backward is the standard flash decomposition with the forward's
row-logsumexp L as the residual:

    P  = exp(scale * Q K^T - L)
    dV = P^T dO
    dS = P * (dO V^T - D),   D = rowsum(dO * O)
    dQ = scale * dS K        (grid over q-blocks, streaming k)
    dK = scale * dS^T Q      (grid over k-blocks, streaming q)

Gradcheck vs einsum SDPA in tests/test_flash_attention.py; compiled-mode
validation + stride-4 timing in the on-device round notes (PLAN.md).
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


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref,
                acc_scr, m_scr, s_scr, *, scale: float, seq_len: int,
                block_k: int):
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        s_scr[:] = jnp.zeros_like(s_scr)

    q = q_ref[:].astype(jnp.float32) * scale
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    kpos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kpos < seq_len, s, NEG_INF)

    m_prev = m_scr[:, 0:1]
    l_prev = s_scr[:, 0:1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    s_scr[:] = jnp.broadcast_to(l_new, s_scr.shape)

    @pl.when(j == nk - 1)
    def _():
        l_final = jnp.maximum(s_scr[:, 0:1], 1e-30)
        o_ref[:] = (acc_scr[:] / l_final).astype(o_ref.dtype)
        l_ref[:] = jnp.broadcast_to(
            m_scr[:, 0:1] + jnp.log(l_final), l_ref.shape
        )


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, d_ref, dq_ref,
                   acc_scr, *, scale: float, seq_len: int, block_k: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    s = scale * jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    kpos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kpos < seq_len, s, NEG_INF)
    p = jnp.exp(s - l_ref[:, 0:1])
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - d_ref[:, 0:1])
    acc_scr[:] += scale * jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        dq_ref[:] = acc_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, d_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float,
                    seq_len: int, block_q: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    s = scale * jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    qpos = i * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    p = jnp.exp(s - l_ref[:, 0:1])
    # zero padded q rows (their L is garbage)
    p = jnp.where(qpos < seq_len, p, 0.0)
    dv_scr[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - d_ref[:, 0:1])
    dk_scr[:] += scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        dk_ref[:] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_scr[:].astype(dv_ref.dtype)


def _pad_to(x, n):
    return jnp.pad(x, ((0, n - x.shape[0]), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_one_head(q, k, v, block_q: int, block_k: int, interpret: bool):
    out, _ = _flash_fwd_impl(q, k, v, block_q, block_k, interpret)
    return out


def _flash_fwd_impl(q, k, v, block_q, block_k, interpret):
    seq_len, d = q.shape
    nq = pl.cdiv(seq_len, block_q)
    nk = pl.cdiv(seq_len, block_k)
    qp = _pad_to(q, nq * block_q)
    kp = _pad_to(k, nk * block_k)
    vp = _pad_to(v, nk * block_k)
    scale = 1.0 / math.sqrt(d)

    qspec = pl.BlockSpec((block_q, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((block_k, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((block_q, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, seq_len=seq_len,
                          block_k=block_k),
        grid=(nq, nk),
        in_specs=[qspec, kspec, kspec],
        out_specs=(qspec, lspec),
        out_shape=(
            jax.ShapeDtypeStruct(qp.shape, q.dtype),
            jax.ShapeDtypeStruct((nq * block_q, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:seq_len], lse


def _flash_fwd(q, k, v, block_q, block_k, interpret):
    out, lse = _flash_fwd_impl(q, k, v, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    seq_len, d = q.shape
    nq = pl.cdiv(seq_len, block_q)
    nk = pl.cdiv(seq_len, block_k)
    scale = 1.0 / math.sqrt(d)

    dvec = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                   axis=-1, keepdims=True)  # (N, 1)
    dmat = jnp.broadcast_to(dvec, (seq_len, 128))
    dmat = _pad_to(dmat, nq * block_q)

    qp = _pad_to(q, nq * block_q)
    gp = _pad_to(g, nq * block_q)
    kp = _pad_to(k, nk * block_k)
    vp = _pad_to(v, nk * block_k)

    qspec_i = pl.BlockSpec((block_q, d), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    kspec_i = pl.BlockSpec((block_k, d), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)
    lspec_i = pl.BlockSpec((block_q, 128), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, seq_len=seq_len,
                          block_k=block_k),
        grid=(nq, nk),
        in_specs=[qspec_i, kspec_i, kspec_i, qspec_i, lspec_i, lspec_i],
        out_specs=qspec_i,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, gp, lse, dmat)

    # dK/dV: grid over k-blocks (outer), streaming q-blocks (inner)
    qspec_j = pl.BlockSpec((block_q, d), lambda j, i: (i, 0),
                           memory_space=pltpu.VMEM)
    kspec_j = pl.BlockSpec((block_k, d), lambda j, i: (j, 0),
                           memory_space=pltpu.VMEM)
    lspec_j = pl.BlockSpec((block_q, 128), lambda j, i: (i, 0),
                           memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, seq_len=seq_len,
                          block_q=block_q),
        grid=(nk, nq),
        in_specs=[qspec_j, kspec_j, kspec_j, qspec_j, lspec_j, lspec_j],
        out_specs=(kspec_j, kspec_j),
        out_shape=(
            jax.ShapeDtypeStruct(kp.shape, k.dtype),
            jax.ShapeDtypeStruct(vp.shape, v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, gp, lse, dmat)
    return dq[:seq_len], dk[:seq_len], dv[:seq_len]


_flash_one_head.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: Array, k: Array, v: Array,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False) -> Array:
    """(B, N, H, D) attention with streaming softmax; differentiable.

    Drop-in for vit.sdpa's contraction (no mask support; ViT is dense
    bidirectional). ``interpret=True`` runs the Pallas interpreter (CPU
    testing).
    """
    b, n, h, d = q.shape

    def flat(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    out = jax.vmap(
        lambda qq, kk, vv: _flash_one_head(qq, kk, vv, block_q, block_k,
                                           interpret)
    )(flat(q), flat(k), flat(v))
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
