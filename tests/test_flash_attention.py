"""Pallas flash-attention (fwd + custom-VJP bwd) vs einsum SDPA.

Interpreter mode on CPU; the compiled-mode validation and the stride-4
(~26k-token) timing run on device (PLAN.md round-2 notes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvt_tpu.models.vit import sdpa
from dvt_tpu.ops.flash_attention import flash_attention


def _inputs(rng, b, n, h, d):
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    return mk(), mk(), mk()


@pytest.mark.parametrize("n,block", [(64, 32), (100, 32)])  # padded case too
def test_matches_sdpa(rng, n, block):
    q, k, v = _inputs(rng, 2, n, 2, 16)
    ref = sdpa(q, k, v, precision="highest")
    out = flash_attention(q, k, v, block_q=block, block_k=block,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("n,block", [(64, 32), (72, 32)])  # padded case too
def test_gradients_match_sdpa(rng, n, block):
    """Full gradcheck of the custom VJP against autodiff through SDPA."""
    q, k, v = _inputs(rng, 1, n, 2, 16)
    cot = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=block, block_k=block,
                                       interpret=True) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v, precision="highest") * cot)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-5, rtol=1e-3, err_msg=f"d{name}")


def test_grad_flows_through_vit_block(rng):
    """flash attention is usable inside a trained module (stage-3 path)."""
    q, k, v = _inputs(rng, 1, 40, 2, 8)
    w = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32) * 0.1)

    def loss(w):
        o = flash_attention(q @ w, k, v, block_q=32, block_k=32,
                            interpret=True)
        return jnp.mean(o ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
