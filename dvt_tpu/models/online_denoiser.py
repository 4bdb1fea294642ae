"""Stage-2/3 generalizable denoiser.

One (or N) pre-LN transformer block(s) that map raw ViT feature maps to
denoised ones, with a learnable absolute pos embed resampled to the runtime
grid - the TPU-native counterpart of the reference ``Denoiser``
(dvt/models/online_denoiser.py): timm Block(dim=C, heads=C/64, mlp_ratio=4,
qkv_bias, LN eps 1e-6, GELU) + pos embed (1, h*w, C) init randn*0.02
resampled via resample_abs_pos_embed (:90).

The optional frozen ViT the reference embeds in the module is composed
functionally here via ``DenoisingPipeline`` (params stay separate pytrees,
which keeps teacher freezing and checkpoint stripping trivial).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvt_tpu.models.vit import Block
from dvt_tpu.models.zoo import ViTConfig
from dvt_tpu.ops.resample import resample_abs_pos_embed

Array = jax.Array


def _block_cfg(feat_dim: int) -> ViTConfig:
    """Config for a denoiser block: timm Block defaults per the reference."""
    return ViTConfig(
        name="denoiser_block",
        embed_dim=feat_dim,
        depth=1,
        num_heads=max(feat_dim // 64, 1),
        patch_size=1,
        mlp_ratio=4.0,
        init_values=None,
        norm_eps=1e-6,
    )


def denoiser_from_params(params, feat_dim: int, dtype=jnp.float32,
                         precision=None) -> "Denoiser":
    """Build a Denoiser whose static config matches a loaded param tree.

    Stage-2 checkpoints carry their training grid in pos_embed (1, h*w, C)
    and their depth as blocks_N entries; constructing with defaults
    (37x37, 1 block) would crash the pos-embed resample for other grids
    and - worse - SILENTLY run only block 0 of a deeper checkpoint (flax
    apply ignores unused params)."""
    import math

    n_blocks = sum(1 for k in params if str(k).startswith("blocks_"))
    h = w = 37
    if "pos_embed" in params:
        tokens = params["pos_embed"].shape[1]
        side = int(math.isqrt(tokens))
        if side * side != tokens:
            raise ValueError(
                f"non-square denoiser pos_embed ({tokens} tokens)")
        h = w = side
    return Denoiser(
        noise_map_height=h, noise_map_width=w, feat_dim=feat_dim,
        num_blocks=max(n_blocks, 1), enable_pe="pos_embed" in params,
        dtype=dtype, precision=precision,
    )


class Denoiser(nn.Module):
    noise_map_height: int = 37
    noise_map_width: int = 37
    feat_dim: int = 768
    num_blocks: int = 1
    enable_pe: bool = True
    dtype: Any = jnp.float32
    precision: Any = None  # "highest" for fp32-faithful eval/teacher
    # paths (CLAUDE.md: the TPU default matmul precision is very low)

    @nn.compact
    def __call__(self, x: Array, return_channel_first: bool = False) -> Array:
        """(B, h, w, C) raw features -> (B, h, w, C) denoised features."""
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        if self.enable_pe:
            pos_embed = self.param(
                "pos_embed",
                nn.initializers.normal(stddev=0.02),
                (1, self.noise_map_height * self.noise_map_width, self.feat_dim),
            )
            pe = resample_abs_pos_embed(
                pos_embed,
                (h, w),
                (self.noise_map_height, self.noise_map_width),
                num_prefix_tokens=0,
            )
            x = x + pe.astype(x.dtype)
        cfg = _block_cfg(self.feat_dim)
        for i in range(self.num_blocks):
            x = Block(cfg, dtype=self.dtype, precision=self.precision,
                      name=f"blocks_{i}")(x)
        x = x.reshape(b, h, w, c)
        if return_channel_first:
            x = jnp.transpose(x, (0, 3, 1, 2))
        return x


@dataclasses.dataclass
class DenoisingPipeline:
    """Frozen ViT + trained Denoiser: feature extractor for eval/teacher.

    Mirrors Denoiser(vit=...) in the reference (online_denoiser.py:58-84):
    extracts last-layer features with the wrapped backbone (no grad), then
    denoises them. ``__call__`` returns (B, h, w, C); ``with_class_token``
    also returns the backbone's class token.
    """

    vit: Any  # ViTWrapper
    denoiser: Denoiser
    denoiser_params: Any

    def __call__(self, images: Array, norm: bool = True) -> Array:
        feats = self.vit.get_intermediate_layers(
            images, n=[self.vit.last_layer_index], norm=norm
        )[-1]
        feats = jax.lax.stop_gradient(feats)
        return self.denoiser.apply({"params": self.denoiser_params}, feats)

    def with_class_token(self, images: Array, norm: bool = True):
        outs = self.vit.get_intermediate_layers(
            images,
            n=[self.vit.last_layer_index],
            return_prefix_tokens=True,
            norm=norm,
        )[-1]
        feats, prefix = outs
        feats = jax.lax.stop_gradient(feats)
        denoised = self.denoiser.apply({"params": self.denoiser_params}, feats)
        class_token = jax.lax.stop_gradient(prefix[:, 0])
        return denoised, class_token
