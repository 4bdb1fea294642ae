"""Fused Adam update: one HBM pass over (param, m, v, grad) per step.

Stage 1 runs 25k Adam steps per image over a ~19.7M-param hash table
(reference: torch.optim.Adam in main_img_denoising.py:48-55). The XLA/optax
chain materializes the moment updates as separate HLO ops, costing several
full-table sweeps per step (measured; see PLAN.md). This module provides the
update as a single Pallas kernel so the whole optimizer step is exactly one
read of (param, m, v, grad) and one write of (param, m, v):

    g   = grad + wd * param                       (additive L2, torch Adam)
    m'  = b1 * m + (1 - b1) * g
    v'  = b2 * v + (1 - b2) * g^2
    p'  = param - lr * (m'/bc1) / (sqrt(v'/bc2) + eps)

with bias corrections bc1 = 1-b1^t, bc2 = 1-b2^t computed on the scalar
step. Moments are stored bf16 (fp32 master params); inside the kernel the
arithmetic runs fp32, so the only cost of bf16 moments is the storage
bandwidth -- unlike the XLA path, no separate convert ops materialize.

The kernel consumes arrays in their NATIVE shape (leading dims collapsed to
2-D, which XLA treats as a free bitcast for contiguous arrays): any
pad/copy around the kernel would itself cost full-array sweeps and defeat
the point (measured 5x slowdown with a padding wrapper). Non-divisible row
counts are handled by Pallas block clipping. Exactness is tested against
the reference optax chain in tests/test_fused_adam.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for one grid block across all 7 operands (4 in + 3 out),
# times 2 for pipeline double-buffering. The default scoped-vmem limit on
# v5e is 16 MB; stay well under it.
_BLOCK_BYTES = 4 * 1024 * 1024


def _adam_math(p, m, v, g, lr, bc1, bc2, *, b1, b2, eps, wd):
    g = g + wd * p
    m_new = b1 * m + (1.0 - b1) * g
    v_new = b2 * v + (1.0 - b2) * g * g
    update = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
    return p - lr * update, m_new, v_new


def _kernel(scalars_ref, p_ref, m_ref, v_ref, g_ref,
            p_out, m_out, v_out, *, b1, b2, eps, wd):
    lr = scalars_ref[0]
    bc1 = scalars_ref[1]
    bc2 = scalars_ref[2]
    p = p_ref[:]
    m = m_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    p_new, m_new, v_new = _adam_math(p, m, v, g, lr, bc1, bc2,
                                     b1=b1, b2=b2, eps=eps, wd=wd)
    p_out[:] = p_new
    m_out[:] = m_new.astype(m_out.dtype)
    v_out[:] = v_new.astype(v_out.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("b1", "b2", "eps", "wd", "interpret"),
)
def fused_adam_update(
    param: jax.Array,
    m: jax.Array,
    v: jax.Array,
    grad: jax.Array,
    lr: jax.Array,
    count: jax.Array,
    *,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-15,
    wd: float = 0.0,
    interpret: bool = False,
):
    """One fused Adam step for a single array (any shape).

    ``count`` is the post-increment step (1 on the first update), matching
    optax.scale_by_adam / torch.optim.Adam bias correction.
    Returns (new_param, new_m, new_v) with m/v kept in their input dtype.
    """
    shape = param.shape
    # Collapse to 2-D without copying: row-major contiguous reshape. Narrow
    # trailing dims are widened to 128 lanes when the element count allows
    # (the stage-1 hash table is allocated padded for exactly this,
    # HashGridSpec.padded_entries) -- narrow-lane blocks at large grids are
    # both wasteful and crash the v5e Mosaic pipeline.
    n = param.size
    if n % 128 == 0 and (param.ndim == 1 or param.shape[-1] < 128):
        two_d = (-1, 128)
    elif param.ndim <= 1:
        # 0-d scalar leaves reshape to (1, 1): the docstring promises
        # 'any shape', and fused_adam_apply maps over every tree leaf
        two_d = (1, max(n, 1))
    else:
        two_d = (-1, param.shape[-1])
    p2 = param.reshape(two_d).astype(jnp.float32)
    m2 = m.reshape(two_d)
    v2 = v.reshape(two_d)
    g2 = grad.reshape(two_d).astype(jnp.float32)
    rows, cols = p2.shape

    cnt = count.astype(jnp.float32)
    scalars = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        1.0 - b1 ** cnt,
        1.0 - b2 ** cnt,
    ])

    # bytes per row over all in/out operands (p,g fp32 + m,v in their dtype,
    # each appearing once as input and once as output), doubled for
    # pipeline double-buffering
    msize = jnp.dtype(m.dtype).itemsize
    row_bytes = 2 * cols * (4 + 4 + 4 + 2 * msize + 2 * msize)
    block_rows = min(rows, max(8, _BLOCK_BYTES // row_bytes // 8 * 8))
    grid = -(-rows // block_rows)
    block = pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    p3, m3, v3 = pl.pallas_call(
        functools.partial(_kernel, b1=b1, b2=b2, eps=eps, wd=wd),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block, block, block, block,
        ],
        out_specs=(block, block, block),
        out_shape=(
            jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((rows, cols), m.dtype),
            jax.ShapeDtypeStruct((rows, cols), v.dtype),
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(scalars, p2, m2, v2, g2)

    return (p3.reshape(shape).astype(param.dtype),
            m3.reshape(shape), v3.reshape(shape))


def fused_adam_update_xla(param, m, v, grad, lr, count, *, b1=0.9, b2=0.99,
                          eps=1e-15, wd=0.0):
    """Pure-XLA single-expression reference (and CPU fallback) for the kernel."""
    cnt = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** cnt
    bc2 = 1.0 - b2 ** cnt
    p_new, m_new, v_new = _adam_math(
        param.astype(jnp.float32), m.astype(jnp.float32),
        v.astype(jnp.float32), grad.astype(jnp.float32),
        jnp.asarray(lr, jnp.float32), bc1, bc2, b1=b1, b2=b2, eps=eps, wd=wd)
    return (p_new.astype(param.dtype), m_new.astype(m.dtype),
            v_new.astype(v.dtype))
