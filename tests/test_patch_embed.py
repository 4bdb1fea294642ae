"""Direct tests for the im2col patch extraction across gcd regimes."""

import jax.numpy as jnp
import numpy as np
import pytest

from dvt_tpu.ops.patch_embed import extract_patches, patch_embed


def naive_patches(x, patch, stride):
    b, h, w, c = x.shape
    gh = (h - patch) // stride + 1
    gw = (w - patch) // stride + 1
    out = np.empty((b, gh, gw, patch * patch * c), x.dtype)
    for i in range(gh):
        for j in range(gw):
            win = x[:, i * stride : i * stride + patch,
                    j * stride : j * stride + patch, :]
            out[:, i, j] = win.reshape(b, -1)
    return out


@pytest.mark.parametrize(
    "patch,stride,hw",
    [
        (8, 8, (32, 24)),   # stride == patch
        (14, 7, (42, 56)),  # gcd 7 (DVT stage-1 stride override)
        (14, 4, (38, 30)),  # gcd 2 (video-demo stride 4)
        (16, 7, (48, 41)),  # gcd 1 worst case (patch-16 at stride 7)
        (16, 5, (46, 36)),  # gcd 1, another pitch
        (9, 3, (27, 21)),   # gcd 3, odd patch
    ],
)
def test_extract_patches_matches_naive(rng, patch, stride, hw):
    x = rng.standard_normal((2, *hw, 3)).astype(np.float32)
    ours = np.asarray(extract_patches(jnp.asarray(x), patch, stride))
    ref = naive_patches(x, patch, stride)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=0)


def test_patch_embed_matmul(rng):
    x = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
    kernel = rng.standard_normal((14, 14, 3, 8)).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    out = np.asarray(
        patch_embed(jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias),
                    stride=7, precision="highest")
    )
    ref = naive_patches(x, 14, 7) @ kernel.reshape(-1, 8) + bias
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)
