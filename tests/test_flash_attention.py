"""Pallas flash-attention vs the reference einsum SDPA (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvt_tpu.models.vit import sdpa
from dvt_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("n,block", [(64, 32), (100, 32)])  # padded case too
def test_matches_sdpa(rng, n, block):
    b, h, d = 2, 2, 16
    q = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, h, d)).astype(np.float32))

    ref = sdpa(q, k, v, precision="highest")
    out = flash_attention(q, k, v, block_q=block, block_k=block,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
