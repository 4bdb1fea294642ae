"""Checkpoint-conversion tests: torch state dicts -> our pytrees."""

import numpy as np
import pytest
import torch

from dvt_tpu.models.convert import (
    convert_denoiser_state_dict,
    convert_vit_state_dict,
)
from dvt_tpu.models.zoo import ViTConfig


def test_vit_conversion_shapes_and_transposes():
    cfg = ViTConfig(
        name="t", embed_dim=32, depth=1, num_heads=2, patch_size=4,
        pretrain_img_size=8, init_values=1e-5,
    )
    g = torch.Generator().manual_seed(0)
    sd = {
        "patch_embed.proj.weight": torch.randn(32, 3, 4, 4, generator=g),
        "patch_embed.proj.bias": torch.randn(32, generator=g),
        "pos_embed": torch.randn(1, cfg.num_pos_tokens, 32, generator=g),
        "cls_token": torch.randn(1, 1, 32, generator=g),
        "norm.weight": torch.ones(32),
        "norm.bias": torch.zeros(32),
    }
    b = "blocks.0"
    sd.update({
        f"{b}.norm1.weight": torch.ones(32), f"{b}.norm1.bias": torch.zeros(32),
        f"{b}.norm2.weight": torch.ones(32), f"{b}.norm2.bias": torch.zeros(32),
        f"{b}.attn.qkv.weight": torch.randn(96, 32, generator=g),
        f"{b}.attn.qkv.bias": torch.randn(96, generator=g),
        f"{b}.attn.proj.weight": torch.randn(32, 32, generator=g),
        f"{b}.attn.proj.bias": torch.randn(32, generator=g),
        f"{b}.mlp.fc1.weight": torch.randn(128, 32, generator=g),
        f"{b}.mlp.fc1.bias": torch.randn(128, generator=g),
        f"{b}.mlp.fc2.weight": torch.randn(32, 128, generator=g),
        f"{b}.mlp.fc2.bias": torch.randn(32, generator=g),
        f"{b}.ls1.gamma": torch.full((32,), 1e-5),
        f"{b}.ls2.gamma": torch.full((32,), 1e-5),
    })
    p = convert_vit_state_dict(sd, cfg)
    assert p["patch_embed"]["kernel"].shape == (4, 4, 3, 32)
    np.testing.assert_allclose(
        p["patch_embed"]["kernel"][1, 2, 0, 5],
        sd["patch_embed.proj.weight"][5, 0, 1, 2].numpy(),
    )
    assert p["blocks_0"]["attn"]["qkv"]["kernel"].shape == (32, 96)
    np.testing.assert_allclose(
        p["blocks_0"]["attn"]["qkv"]["kernel"],
        sd["blocks.0.attn.qkv.weight"].numpy().T,
    )
    assert p["blocks_0"]["norm1"]["scale"].shape == (32,)
    assert p["blocks_0"]["ls1"]["gamma"].shape == (32,)


def test_vit_conversion_strips_wrapper_prefix():
    cfg = ViTConfig(
        name="t", embed_dim=8, depth=0, num_heads=1, patch_size=2,
        pretrain_img_size=4, class_token=False,
    )
    sd = {
        "model.patch_embed.proj.weight": torch.zeros(8, 3, 2, 2),
        "model.patch_embed.proj.bias": torch.zeros(8),
        "model.pos_embed": torch.zeros(1, cfg.num_pos_tokens, 8),
        "model.norm.weight": torch.ones(8),
        "model.norm.bias": torch.zeros(8),
    }
    p = convert_vit_state_dict(sd, cfg)
    assert p["patch_embed"]["kernel"].shape == (2, 2, 3, 8)


@pytest.mark.parametrize("multi", [False, True])
def test_denoiser_conversion_matches_module(multi):
    """Converted reference stage-2 dicts must load into our Denoiser."""
    import jax
    import jax.numpy as jnp

    from dvt_tpu.models.online_denoiser import Denoiser

    dim = 64
    g = torch.Generator().manual_seed(1)
    prefix = ["denoiser.0", "denoiser.1"] if multi else ["denoiser"]
    sd = {"pos_embed": torch.randn(1, 16, dim, generator=g)}
    for b in prefix:
        sd.update({
            f"{b}.norm1.weight": torch.ones(dim),
            f"{b}.norm1.bias": torch.zeros(dim),
            f"{b}.norm2.weight": torch.ones(dim),
            f"{b}.norm2.bias": torch.zeros(dim),
            f"{b}.attn.qkv.weight": torch.randn(3 * dim, dim, generator=g),
            f"{b}.attn.qkv.bias": torch.randn(3 * dim, generator=g),
            f"{b}.attn.proj.weight": torch.randn(dim, dim, generator=g),
            f"{b}.attn.proj.bias": torch.randn(dim, generator=g),
            f"{b}.mlp.fc1.weight": torch.randn(4 * dim, dim, generator=g),
            f"{b}.mlp.fc1.bias": torch.randn(4 * dim, generator=g),
            f"{b}.mlp.fc2.weight": torch.randn(dim, 4 * dim, generator=g),
            f"{b}.mlp.fc2.bias": torch.randn(dim, generator=g),
        })
    # frozen vit keys must be ignored
    sd["vit.model.cls_token"] = torch.zeros(1, 1, dim)
    params = convert_denoiser_state_dict(sd)

    module = Denoiser(
        noise_map_height=4, noise_map_width=4, feat_dim=dim,
        num_blocks=len(prefix),
    )
    ref = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, dim)))["params"]
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes
    out = module.apply({"params": params}, jnp.ones((1, 4, 4, dim)))
    assert out.shape == (1, 4, 4, dim)
    assert np.isfinite(np.asarray(out)).all()


def test_denoiser_export_roundtrip():
    import jax
    import jax.numpy as jnp

    from dvt_tpu.models.convert import export_denoiser_state_dict
    from dvt_tpu.models.online_denoiser import Denoiser

    module = Denoiser(noise_map_height=3, noise_map_width=3, feat_dim=64)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 3, 64)))[
        "params"
    ]
    sd = export_denoiser_state_dict(params)
    back = convert_denoiser_state_dict(sd)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        node = back
        for k in path:
            node = node[k.key]
        np.testing.assert_allclose(np.asarray(leaf), node, atol=1e-6)


def test_vit_export_roundtrip():
    import jax
    import jax.numpy as jnp

    from dvt_tpu.models.convert import export_vit_state_dict
    from dvt_tpu.models.vit import VisionTransformer

    cfg = ViTConfig(
        name="t", embed_dim=32, depth=2, num_heads=2, patch_size=4,
        pretrain_img_size=8, init_values=1e-5,
    )
    model = VisionTransformer(cfg, stride=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))[
        "params"
    ]
    sd = export_vit_state_dict(params, cfg)
    back = convert_vit_state_dict(sd, cfg)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        node = back
        for k in path:
            node = node[k.key]
        np.testing.assert_allclose(np.asarray(leaf), node, atol=1e-6)
