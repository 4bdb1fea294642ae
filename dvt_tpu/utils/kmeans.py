"""Jitted cosine k-means (replaces the reference's torch_kmeans dependency,
dvt/utils/visualization/visualization_tools.py:6,115): kmeans++-free random
init, fixed-iteration Lloyd loop under lax.scan so it compiles once."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_clusters", "num_iters"))
def cosine_kmeans_fit(key, feats: jax.Array, num_clusters: int = 10,
                      num_iters: int = 20) -> jax.Array:
    """feats (N, C) -> unit-norm cluster centers (K, C); fit once, predict
    on later frames with ``cosine_kmeans_predict`` (the reference's video
    demo fits on frame 0 and predicts the rest, make_video_demo.py:109-113,
    138-140)."""
    centers = _fit(key, feats, num_clusters, num_iters)
    return centers


@jax.jit
def cosine_kmeans_predict(feats: jax.Array, centers: jax.Array) -> jax.Array:
    x = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
    return jnp.argmax(x @ centers.T, axis=-1)


@partial(jax.jit, static_argnames=("num_clusters", "num_iters"))
def cosine_kmeans(key, feats: jax.Array, num_clusters: int = 10,
                  num_iters: int = 20) -> jax.Array:
    """feats (N, C) -> labels (N,) by cosine-similarity k-means."""
    centers = _fit(key, feats, num_clusters, num_iters)
    return cosine_kmeans_predict(feats, centers)


def _fit(key, feats: jax.Array, num_clusters: int, num_iters: int):
    n, c = feats.shape
    x = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
    init_idx = jax.random.choice(key, n, (num_clusters,), replace=False)
    centers = x[init_idx]

    def step(centers, _):
        sims = x @ centers.T  # (N, K)
        labels = jnp.argmax(sims, axis=-1)
        one_hot = jax.nn.one_hot(labels, num_clusters, dtype=x.dtype)
        sums = one_hot.T @ x  # (K, C)
        counts = one_hot.sum(0)[:, None]
        new_centers = jnp.where(
            counts > 0, sums / jnp.maximum(counts, 1), centers
        )
        new_centers = new_centers / (
            jnp.linalg.norm(new_centers, axis=-1, keepdims=True) + 1e-8
        )
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=num_iters)
    return centers
