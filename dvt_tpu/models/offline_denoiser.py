"""Stage-1 per-image artifact decomposition model.

Decomposes raw ViT features as

    raw = F(clean; neural field at global coords)
        + G(shared position artifact, sampled at view coords)
        + h(image-dependent residual MLP)           [phase 2 only]

mirroring the reference ``SingleImageDenoiser`` (dvt/models/offline_denoiser.py):
  * ``shared_artifacts`` G: (h, w, C) learnable map, init randn*0.02, sampled
    bilinearly at view coordinates with align_corners=True semantics (:96-101).
  * residual MLP h: C -> C/4 -> C/4 -> C with ReLU (:40-46).
  * losses: patch MSE + (1 - cos) on the reconstruction (:122-125), plus in
    phase 2 a 0.1x MSE of h against the detached residual (:133-135) and a
    0.02x L1 sparsity term (:137).
  * two-phase schedule (:49-60): the reference freezes G and *starts* h after
    50% of steps; here that is a traced ``phase2`` flag - loss terms are
    gated inside the graph, and the fit loop masks G's gradient, so one
    compiled program serves both phases.

The module is pure w.r.t. its params, so the whole fit vmaps over images.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvt_tpu.ops.grid_sample import grid_sample_2d

Array = jax.Array


def cosine_similarity(a: Array, b: Array, axis: int = -1, eps: float = 1e-8) -> Array:
    """torch.nn.functional.cosine_similarity semantics (per-element norm floor)."""
    an = jnp.maximum(jnp.linalg.norm(a, axis=axis), eps)
    bn = jnp.maximum(jnp.linalg.norm(b, axis=axis), eps)
    return jnp.sum(a * b, axis=axis) / (an * bn)


class SingleImageDenoiser(nn.Module):
    noise_map_height: int = 37
    noise_map_width: int = 37
    feat_dim: int = 768
    enable_residual_predictor: bool = True
    disable_pe: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        if self.disable_pe:
            init = nn.initializers.zeros
        else:
            init = nn.initializers.normal(stddev=0.02)
        self.shared_artifacts = self.param(
            "shared_artifacts",
            init,
            (self.noise_map_height, self.noise_map_width, self.feat_dim),
        )
        if self.enable_residual_predictor:
            self.residual_predictor = [
                nn.Dense(self.feat_dim // 4, dtype=self.dtype, name="res_0"),
                nn.Dense(self.feat_dim // 4, dtype=self.dtype, name="res_2"),
                nn.Dense(self.feat_dim, dtype=self.dtype, name="res_4"),
            ]

    def _residual(self, x: Array) -> Array:
        h = nn.relu(self.residual_predictor[0](x))
        h = nn.relu(self.residual_predictor[1](h))
        return self.residual_predictor[2](h)

    def shared_at(self, coords: Optional[Array]) -> Array:
        """Sample G at view coords in [0, 1]; None -> the full grid.

        Every coordinate producer in this codebase (data/crops.py grids,
        engine.make_patch_coordinates) emits [0, 1]; the reference stores
        the same range and rescales to [-1, 1] immediately before
        F.grid_sample (offline_denoiser.py:96-101) - that conversion
        lives HERE so callers pass their stored coords unchanged."""
        g = self.shared_artifacts.astype(self.dtype)
        if coords is None:
            return g.reshape(-1, self.feat_dim)
        return grid_sample_2d(g, coords * 2.0 - 1.0, align_corners=True)

    def __call__(
        self,
        raw_vit_outputs: Array,
        denoised_feats: Array,
        shared_artifact_coords: Optional[Array] = None,
        phase2: Array | bool = False,
        return_visualization: bool = False,
    ) -> Dict[str, Array]:
        """Compute the decomposition losses.

        Args:
          raw_vit_outputs: (N, C) raw features (or (H, W, C); flattened).
          denoised_feats: (N, C) neural-field output F at global coords.
          shared_artifact_coords: (N, 2) view coords in [0,1] (the range
            the data pipeline stores); None uses the full artifact grid
            (the visualization/export path).
          phase2: traced flag - residual predictor active, G frozen.
          return_visualization: include decomposition terms in the output.
        """
        original_shape = raw_vit_outputs.shape
        raw = raw_vit_outputs.reshape(-1, self.feat_dim)
        denoised = denoised_feats.reshape(-1, self.feat_dim)
        if shared_artifact_coords is None:
            shared = self.shared_at(None)
        else:
            shared = self.shared_at(shared_artifact_coords.reshape(-1, 2))

        use_res = self.enable_residual_predictor
        phase2 = jnp.asarray(phase2)
        gate = phase2.astype(raw.dtype)

        pred_residual = self._residual(raw) if use_res else None
        pred = denoised + shared
        if use_res:
            # the reconstruction sees a detached h, gated by phase
            pred = pred + gate * jax.lax.stop_gradient(pred_residual)

        patch_l2_loss = jnp.mean((pred - raw) ** 2)
        cos_loss = 1.0 - jnp.mean(cosine_similarity(pred, raw))
        loss = patch_l2_loss + cos_loss
        results = {
            "patch_l2_loss": patch_l2_loss,
            "cosine_similarity_loss": cos_loss,
        }
        if use_res:
            gt_residual = jax.lax.stop_gradient(raw - denoised - shared)
            residual_loss = 0.1 * jnp.mean((pred_residual - gt_residual) ** 2)
            sparsity_loss = 0.02 * jnp.mean(jnp.abs(pred_residual))
            loss = loss + gate * (residual_loss + sparsity_loss)
            results["residual_loss"] = gate * residual_loss
            results["residual_sparsity_loss"] = gate * sparsity_loss
        results["loss"] = loss

        if return_visualization:
            def shaped(x):
                return x.reshape(*original_shape[:-1], self.feat_dim)

            results["raw_vit_outputs"] = shaped(raw)
            results["pred_features"] = shaped(pred)
            results["denoised_feats"] = shaped(denoised)
            results["shared_patterns"] = shaped(shared)
            if use_res:
                results["pred_residual"] = shaped(pred_residual)
                results["shared_patterns_and_residual"] = shaped(
                    shared + pred_residual
                )
                results["denoised_features"] = shaped(raw - shared - pred_residual)
            else:
                results["denoised_features"] = shaped(raw - shared)
        return results
