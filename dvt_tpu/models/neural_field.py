"""Neural feature field: 2-D coords in [0,1] -> C-dim clean features.

TPU-native counterpart of the reference's ``NeuralFeatureField``
(dvt/models/neural_feature_field.py): a multiresolution hash-grid encoding
(ops/hash_encoding.py replaces the tiny-cuda-nn CUDA kernel) followed by a
2-layer MLP Linear(L*F -> C/2) - ReLU - Linear(C/2 -> C).

Built as a linen module so a whole batch of independent per-image fields is
just a vmapped parameter pytree.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvt_tpu.ops.hash_encoding import HashGridSpec, hash_encode


def default_hash_spec(n_levels: int = 16,
                      matmul_level_threshold: int = 4096) -> HashGridSpec:
    """Stage-1 default grid: matches main_img_denoising.py:183 + the
    reference encoding config (neural_feature_field.py:25-39)."""
    return HashGridSpec(
        n_levels=n_levels,
        n_features=8,
        log2_hashmap_size=20,
        base_resolution=16,
        max_resolution=1024,
        matmul_level_threshold=matmul_level_threshold,
    )


class NeuralFeatureField(nn.Module):
    feat_dim: int = 768
    spec: HashGridSpec = HashGridSpec()
    dtype: Any = jnp.float32

    def setup(self):
        # setup-style (not @nn.compact) so ``from_encoding`` can run the MLP
        # on an externally computed encoding - the deferred-sweep fit path
        # (stage1.py) gathers the table rows outside the differentiated
        # function. Param names ("table", "mlp_0", "mlp_2") are unchanged.
        from dvt_tpu.ops.hash_encoding import init_hash_table

        self.table = self.param(
            "table", lambda key: init_hash_table(key, self.spec)
        )
        self.mlp_0 = nn.Dense(self.feat_dim // 2, dtype=self.dtype)
        self.mlp_2 = nn.Dense(self.feat_dim, dtype=self.dtype)

    def __call__(self, coords: jax.Array,
                 corner_key: jax.Array | None = None) -> jax.Array:
        """coords (..., 2) in [0, 1] -> (..., feat_dim) features.

        ``corner_key`` enables stochastic corner sampling in the encoding
        (training-time variance/bandwidth trade, see ops/hash_encoding.py).
        """
        enc = hash_encode(
            self.table, coords, self.spec, corner_key
        ).astype(self.dtype)
        return self.from_encoding(enc)

    def from_encoding(self, enc: jax.Array) -> jax.Array:
        """MLP head only: (..., n_output_dims) encoding -> (..., feat_dim)."""
        x = self.mlp_0(enc.astype(self.dtype))
        x = nn.relu(x)
        return self.mlp_2(x)
