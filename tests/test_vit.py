"""ViT backbone tests: shapes, taps, and numerical parity against an
independent torch implementation of the timm forward semantics the reference
relies on (strided patch embed + dynamic pos-embed resample + pre-LN blocks +
final-norm'd intermediates; see SURVEY.md 3.5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dvt_tpu.models.convert import convert_vit_state_dict
from dvt_tpu.models.vit import VisionTransformer, ViTWrapper
from dvt_tpu.models.zoo import ViTConfig, get_model_config


def tiny_cfg(**kw):
    base = dict(
        name="tiny_test",
        embed_dim=64,
        depth=2,
        num_heads=2,
        patch_size=8,
        pretrain_img_size=32,
        norm_eps=1e-6,
    )
    base.update(kw)
    return ViTConfig(**base)


def make_torch_state_dict(cfg: ViTConfig, seed=0):
    """Random weights in timm naming/layout."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd["patch_embed.proj.weight"] = r(cfg.embed_dim, 3, cfg.patch_size, cfg.patch_size)
    if not cfg.pre_norm:  # timm: bias=not pre_norm (CLIP has none)
        sd["patch_embed.proj.bias"] = r(cfg.embed_dim)
    sd["pos_embed"] = r(1, cfg.num_pos_tokens, cfg.embed_dim)
    if cfg.class_token:
        sd["cls_token"] = r(1, 1, cfg.embed_dim)
    if cfg.reg_tokens:
        sd["reg_token"] = r(1, cfg.reg_tokens, cfg.embed_dim)
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        d = cfg.embed_dim
        hidden = int(d * cfg.mlp_ratio)
        sd[f"{b}.norm1.weight"] = 1 + 0.1 * r(d)
        sd[f"{b}.norm1.bias"] = r(d)
        if cfg.eva_arch:
            # EVA02: separate q/k/v (k bias-less), SwiGLU w/ inner LN
            sd[f"{b}.attn.q_proj.weight"] = r(d, d)
            sd[f"{b}.attn.q_proj.bias"] = r(d)
            sd[f"{b}.attn.k_proj.weight"] = r(d, d)
            sd[f"{b}.attn.v_proj.weight"] = r(d, d)
            sd[f"{b}.attn.v_proj.bias"] = r(d)
            if cfg.attn_inner_norm:  # EVA-CLIP scale_attn_inner
                sd[f"{b}.attn.norm.weight"] = 1 + 0.1 * r(d)
                sd[f"{b}.attn.norm.bias"] = r(d)
        else:
            sd[f"{b}.attn.qkv.weight"] = r(3 * d, d)
            sd[f"{b}.attn.qkv.bias"] = r(3 * d)
        sd[f"{b}.attn.proj.weight"] = r(d, d)
        sd[f"{b}.attn.proj.bias"] = r(d)
        sd[f"{b}.norm2.weight"] = 1 + 0.1 * r(d)
        sd[f"{b}.norm2.bias"] = r(d)
        if cfg.eva_arch:
            sd[f"{b}.mlp.fc1_g.weight"] = r(hidden, d)
            sd[f"{b}.mlp.fc1_g.bias"] = r(hidden)
            sd[f"{b}.mlp.fc1_x.weight"] = r(hidden, d)
            sd[f"{b}.mlp.fc1_x.bias"] = r(hidden)
            sd[f"{b}.mlp.norm.weight"] = 1 + 0.1 * r(hidden)
            sd[f"{b}.mlp.norm.bias"] = r(hidden)
            sd[f"{b}.mlp.fc2.weight"] = r(d, hidden)
            sd[f"{b}.mlp.fc2.bias"] = r(d)
        elif cfg.act == "swiglu_packed":
            # DINOv2-giant style packed SwiGLU (timm SwiGLUPacked)
            gh_ = cfg.glu_hidden or int(d * cfg.mlp_ratio * 2 / 3)
            sd[f"{b}.mlp.fc1.weight"] = r(2 * gh_, d)
            sd[f"{b}.mlp.fc1.bias"] = r(2 * gh_)
            sd[f"{b}.mlp.fc2.weight"] = r(d, gh_)
            sd[f"{b}.mlp.fc2.bias"] = r(d)
        else:
            sd[f"{b}.mlp.fc1.weight"] = r(hidden, d)
            sd[f"{b}.mlp.fc1.bias"] = r(hidden)
            sd[f"{b}.mlp.fc2.weight"] = r(d, hidden)
            sd[f"{b}.mlp.fc2.bias"] = r(hidden and d)
        if cfg.init_values is not None:
            sd[f"{b}.ls1.gamma"] = cfg.init_values * torch.ones(d)
            sd[f"{b}.ls2.gamma"] = cfg.init_values * torch.ones(d)
    if cfg.pre_norm:
        sd["norm_pre.weight"] = 1 + 0.1 * r(cfg.embed_dim)
        sd["norm_pre.bias"] = r(cfg.embed_dim)
    sd["norm.weight"] = 1 + 0.1 * r(cfg.embed_dim)
    sd["norm.bias"] = r(cfg.embed_dim)
    return sd


def torch_rope_tables(gh, gw, head_dim, ref_shape, temperature=10000.0):
    """Independent torch build of the axial rotary tables (timm
    RotaryEmbeddingCat convention: head_dim//4 bands/axis, [y, x] concat,
    each angle repeated twice, interleaved-pair rotation)."""
    bands = head_dim // 4
    inv = 1.0 / temperature ** (torch.arange(bands, dtype=torch.float64) * 4.0 / head_dim)
    ys = torch.arange(gh, dtype=torch.float64)
    xs = torch.arange(gw, dtype=torch.float64)
    if ref_shape is not None:
        ys = ys / max(gh, 1) * ref_shape[0]
        xs = xs / max(gw, 1) * ref_shape[1]
    ay = (ys[:, None] * inv)[:, None, :].expand(gh, gw, bands)
    ax = (xs[:, None] * inv)[None, :, :].expand(gh, gw, bands)
    ang = torch.cat([ay, ax], -1).reshape(gh * gw, 2 * bands)
    ang = ang.repeat_interleave(2, dim=-1).float()
    return ang.sin(), ang.cos()


def torch_apply_rope(t, sin, cos, n_prefix):
    """t: (B, heads, N, head_dim); rotate spatial tokens only."""
    prefix, sp = t[:, :, :n_prefix], t[:, :, n_prefix:]
    x1, x2 = sp[..., 0::2], sp[..., 1::2]
    rot = torch.stack([-x2, x1], dim=-1).reshape(sp.shape)
    sp = sp * cos + rot * sin
    return torch.cat([prefix, sp], dim=2)


def torch_vit_forward(sd, cfg: ViTConfig, x_nchw, stride, tap_indices,
                      window_size=0):
    """Oracle forward replicating timm VisionTransformer semantics.

    ``window_size`` > 0 replicates the reference's ViTDet adapter
    (evaluation/vitdet/vision_transformer.py:98-138): prefix tokens are
    dropped after the pos embed, and every block's attention runs over
    padded non-overlapping window x window tiles of the spatial grid."""
    x = F.conv2d(
        x_nchw,
        sd["patch_embed.proj.weight"],
        sd.get("patch_embed.proj.bias"),
        stride=stride,
    )
    b, c, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)  # (B, N, C)

    pe = sd["pos_embed"]
    n_prefix = cfg.num_prefix_tokens
    pe_prefix_count = 0 if cfg.no_embed_class else n_prefix
    prefix_pe, grid_pe = pe[:, :pe_prefix_count], pe[:, pe_prefix_count:]
    old = cfg.pretrain_grid
    grid_pe = grid_pe.reshape(1, *old, c).permute(0, 3, 1, 2)
    grid_pe = F.interpolate(
        grid_pe, size=(gh, gw), mode="bicubic", antialias=True, align_corners=False
    )
    grid_pe = grid_pe.permute(0, 2, 3, 1).reshape(1, -1, c)

    prefix_toks = []
    if cfg.class_token:
        prefix_toks.append(sd["cls_token"].expand(b, -1, -1))
    if cfg.reg_tokens:
        prefix_toks.append(sd["reg_token"].expand(b, -1, -1))
    if cfg.no_embed_class:
        x = x + grid_pe
        if prefix_toks:
            x = torch.cat(prefix_toks + [x], dim=1)
    else:
        if prefix_toks:
            x = torch.cat(prefix_toks + [x], dim=1)
        x = x + torch.cat([prefix_pe, grid_pe], dim=1)

    def ln(t, w, bname):
        return F.layer_norm(t, (c,), sd[w], sd[bname], eps=cfg.norm_eps)

    if cfg.pre_norm:
        x = ln(x, "norm_pre.weight", "norm_pre.bias")

    def act(t):
        if cfg.act == "quick_gelu":
            return t * torch.sigmoid(1.702 * t)
        return F.gelu(t)

    rope = None
    if cfg.eva_arch and cfg.use_rope:
        rope = torch_rope_tables(gh, gw, c // cfg.num_heads,
                                 cfg.rope_ref_feat_shape)

    if window_size:
        assert rope is None
        x = x[:, n_prefix:]
        n_prefix = 0
        ws = window_size
        pad_h = (ws - gh % ws) % ws
        pad_w = (ws - gw % ws) % ws
        hp, wp = gh + pad_h, gw + pad_w

    taps = {}
    for i in range(cfg.depth):
        bk = f"blocks.{i}"
        y = ln(x, f"{bk}.norm1.weight", f"{bk}.norm1.bias")
        nh = cfg.num_heads

        if window_size:
            # window partition (vision_transformer.py:24-44)
            y4 = F.pad(y.view(b, gh, gw, c), (0, 0, 0, pad_w, 0, pad_h))
            y = (y4.view(b, hp // ws, ws, wp // ws, ws, c)
                 .permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c))

        def heads(t):
            return t.view(t.shape[0], -1, nh, c // nh).transpose(1, 2)

        if cfg.eva_arch:
            q = F.linear(y, sd[f"{bk}.attn.q_proj.weight"],
                         sd[f"{bk}.attn.q_proj.bias"])
            k = F.linear(y, sd[f"{bk}.attn.k_proj.weight"])
            v = F.linear(y, sd[f"{bk}.attn.v_proj.weight"],
                         sd[f"{bk}.attn.v_proj.bias"])
        else:
            qkv = F.linear(y, sd[f"{bk}.attn.qkv.weight"],
                           sd[f"{bk}.attn.qkv.bias"])
            q, k, v = qkv.chunk(3, dim=-1)
        q, k, v = heads(q), heads(k), heads(v)
        if rope is not None:
            sin, cos = rope
            q = torch_apply_rope(q, sin, cos, n_prefix)
            k = torch_apply_rope(k, sin, cos, n_prefix)

        att = F.scaled_dot_product_attention(q, k, v)
        att = att.transpose(1, 2).reshape(att.shape[0], -1, c)
        if cfg.eva_arch and cfg.attn_inner_norm:
            att = ln(att, f"{bk}.attn.norm.weight", f"{bk}.attn.norm.bias")
        att = F.linear(att, sd[f"{bk}.attn.proj.weight"], sd[f"{bk}.attn.proj.bias"])
        if window_size:
            # window unpartition (vision_transformer.py:47-66)
            att = (att.view(-1, hp // ws, wp // ws, ws, ws, c)
                   .permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
                   [:, :gh, :gw].reshape(b, gh * gw, c))
        if cfg.init_values is not None:
            att = att * sd[f"{bk}.ls1.gamma"]
        x = x + att
        y = ln(x, f"{bk}.norm2.weight", f"{bk}.norm2.bias")
        if cfg.eva_arch:
            g = F.linear(y, sd[f"{bk}.mlp.fc1_g.weight"], sd[f"{bk}.mlp.fc1_g.bias"])
            h2 = F.linear(y, sd[f"{bk}.mlp.fc1_x.weight"], sd[f"{bk}.mlp.fc1_x.bias"])
            y = F.silu(g) * h2
            y = F.layer_norm(y, (y.shape[-1],), sd[f"{bk}.mlp.norm.weight"],
                             sd[f"{bk}.mlp.norm.bias"], eps=cfg.norm_eps)
            y = F.linear(y, sd[f"{bk}.mlp.fc2.weight"], sd[f"{bk}.mlp.fc2.bias"])
        elif cfg.act == "swiglu_packed":
            y = F.linear(y, sd[f"{bk}.mlp.fc1.weight"], sd[f"{bk}.mlp.fc1.bias"])
            y1, y2 = y.chunk(2, dim=-1)
            y = F.silu(y1) * y2
            y = F.linear(y, sd[f"{bk}.mlp.fc2.weight"], sd[f"{bk}.mlp.fc2.bias"])
        else:
            y = F.linear(y, sd[f"{bk}.mlp.fc1.weight"], sd[f"{bk}.mlp.fc1.bias"])
            y = act(y)
            y = F.linear(y, sd[f"{bk}.mlp.fc2.weight"], sd[f"{bk}.mlp.fc2.bias"])
        if cfg.init_values is not None:
            y = y * sd[f"{bk}.ls2.gamma"]
        x = x + y
        if i in tap_indices:
            taps[i] = x

    outs = []
    for i in sorted(tap_indices):
        t = ln(taps[i], "norm.weight", "norm.bias")
        spatial = t[:, n_prefix:].reshape(b, gh, gw, c)
        outs.append(spatial.numpy())
    return outs


@pytest.mark.parametrize(
    "cfg_kw,stride",
    [
        (dict(), 8),  # vanilla, stride == patch
        (dict(), 4),  # stride override (the DVT trick)
        (dict(init_values=1e-1), 4),  # LayerScale (DINOv2/DeiT3 style)
        (dict(reg_tokens=4, no_embed_class=True), 4),  # register tokens
        (dict(class_token=False, no_embed_class=True), 8),  # pure spatial
        (dict(pre_norm=True, act="quick_gelu", norm_eps=1e-5), 4),  # CLIP-style
        # DINOv2-giant style packed SwiGLU (LayerScale like the real one)
        (dict(act="swiglu_packed", glu_hidden=24, init_values=1e-5), 8),
        # EVA02: separate qkv + SwiGLU w/ inner LN, rope off / on, incl.
        # the stride-override (ref-shape-scaled rope) case
        (dict(eva_arch=True, use_rope=False, mlp_ratio=8 / 3), 8),
        (dict(eva_arch=True, rope_ref_feat_shape=(4, 4), mlp_ratio=8 / 3), 8),
        (dict(eva_arch=True, rope_ref_feat_shape=(4, 4), mlp_ratio=8 / 3), 4),
        # EVA-CLIP (the zoo's EVA02 entry): inner attention LayerNorm
        (dict(eva_arch=True, attn_inner_norm=True,
              rope_ref_feat_shape=(4, 4), mlp_ratio=8 / 3), 8),
    ],
)
def test_forward_matches_torch_oracle(cfg_kw, stride):
    cfg = tiny_cfg(**cfg_kw)
    sd = make_torch_state_dict(cfg)
    params = convert_vit_state_dict(sd, cfg)

    x = torch.randn(2, 3, 48, 40, generator=torch.Generator().manual_seed(1))
    taps = [0, cfg.depth - 1]
    ref = torch_vit_forward(sd, cfg, x, stride, taps)

    model = VisionTransformer(cfg, stride=stride, precision="highest")
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    ours = model.apply({"params": params}, x_jax, indices=taps, norm=True)

    for o, r in zip(ours, ref):
        assert o.shape == r.shape
        np.testing.assert_allclose(np.asarray(o), r, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "cfg_kw,window",
    [
        (dict(), 2),                      # even split: 6x5 grid pads to 6x6
        (dict(), 4),                      # padding on both axes
        (dict(init_values=1e-1), 3),      # LayerScale + padding
        (dict(reg_tokens=4, no_embed_class=True), 2),  # prefix dropped
    ],
)
def test_windowed_forward_matches_torch_oracle(cfg_kw, window):
    """window_size mode == the reference ViTDet adapter
    (evaluation/vitdet/vision_transformer.py:98-138): prefix-free blocks
    with attention over padded window tiles."""
    cfg = tiny_cfg(**cfg_kw)
    sd = make_torch_state_dict(cfg)
    params = convert_vit_state_dict(sd, cfg)

    x = torch.randn(2, 3, 48, 40, generator=torch.Generator().manual_seed(2))
    taps = [0, cfg.depth - 1]
    ref = torch_vit_forward(sd, cfg, x, 8, taps, window_size=window)

    model = VisionTransformer(cfg, stride=8, precision="highest",
                              window_size=window)
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    ours = model.apply({"params": params}, x_jax, indices=taps, norm=True)
    for o, r in zip(ours, ref):
        assert o.shape == r.shape
        np.testing.assert_allclose(np.asarray(o), r, atol=2e-4, rtol=1e-3)


def test_window_covering_grid_equals_global():
    """A window >= the feature grid is exactly global attention (for a
    prefix-free model, since windowed mode drops prefix tokens)."""
    cfg = tiny_cfg(class_token=False, no_embed_class=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32, 32, 3)).astype(np.float32))
    base = VisionTransformer(cfg, stride=8, precision="highest")
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    out_g = base.apply({"params": params}, x)[0]
    win = VisionTransformer(cfg, stride=8, precision="highest",
                            window_size=4)  # grid is 4x4
    out_w = win.apply({"params": params}, x)[0]
    np.testing.assert_allclose(
        np.asarray(out_w), np.asarray(out_g), atol=1e-5)


def test_wrapper_api():
    w = ViTWrapper("vit_base_patch16_224.dino", stride=16, seed=0)
    assert w.n_output_dims == 768
    assert w.last_layer_index == 11
    assert w.feat_grid(224, 224) == (14, 14)
    # stride override changes the grid like the reference monkey-patch
    w2 = ViTWrapper(
        "vit_base_patch16_224.dino", stride=8, params=w.params
    )
    assert w2.feat_grid(224, 224) == (27, 27)

    x = jnp.zeros((1, 64, 64, 3))
    feats = w.get_intermediate_layers(x, n=[11], reshape=True)
    assert feats[0].shape == (1, 4, 4, 768)
    nlc = w.get_intermediate_layers(x, n=[11], reshape=False)
    assert nlc[0].shape == (1, 16, 768)
    fp = w.get_intermediate_layers(x, n=[11], return_prefix_tokens=True)
    fmap, prefix = fp[0]
    assert fmap.shape == (1, 4, 4, 768)
    assert prefix.shape == (1, 1, 768)


def test_eva_arch_smoke():
    cfg = tiny_cfg(eva_arch=True, mlp_ratio=8 / 3, rope_ref_feat_shape=(4, 4))
    model = VisionTransformer(cfg, stride=4)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out[0].shape == (1, 7, 7, 64)
    assert np.isfinite(np.asarray(out[0])).all()


def test_normalization_stats_match_reference_families():
    dinov2 = get_model_config("vit_base_patch14_dinov2.lvd142m")
    assert dinov2.mean == (0.485, 0.456, 0.406)
    assert dinov2.pretrain_img_size == 518
    assert dinov2.init_values == 1e-5
    clip = get_model_config("vit_base_patch16_clip_384.laion2b_ft_in12k_in1k")
    assert clip.pre_norm and clip.pretrain_img_size == 384
    reg = get_model_config("vit_base_patch14_reg4_dinov2.lvd142m")
    assert reg.reg_tokens == 4 and reg.no_embed_class
    augreg = get_model_config("vit_base_patch16_384.augreg_in21k_ft_in1k")
    assert augreg.mean == (0.5, 0.5, 0.5)


def test_rope_relative_position_property():
    """Axial rope: q-k inner products depend only on the positional OFFSET
    along each axis (the property that makes rotary embeddings work).
    Checked directly on ops exported by models.vit."""
    from dvt_tpu.models.vit import _apply_rope, _rope_angles

    gh = gw = 6
    hd = 16
    sin, cos = _rope_angles((gh, gw), hd, None)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, gh * gw, 1, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, gh * gw, 1, hd)).astype(np.float32))
    # use the SAME base vectors at every position: scores must then be a
    # function of the offset only
    qb = jnp.broadcast_to(q[:, :1], q.shape)
    kb = jnp.broadcast_to(k[:, :1], k.shape)
    qr = np.asarray(_apply_rope(qb, sin, cos, 0))[0, :, 0]
    kr = np.asarray(_apply_rope(kb, sin, cos, 0))[0, :, 0]

    def pos(y, x):
        return y * gw + x

    # same x-offset, different absolute x (same row)
    s1 = qr[pos(2, 1)] @ kr[pos(2, 3)]
    s2 = qr[pos(2, 2)] @ kr[pos(2, 4)]
    np.testing.assert_allclose(s1, s2, rtol=1e-5)
    # same y-offset, different absolute y (same column)
    s3 = qr[pos(1, 3)] @ kr[pos(4, 3)]
    s4 = qr[pos(2, 3)] @ kr[pos(5, 3)]
    np.testing.assert_allclose(s3, s4, rtol=1e-5)
    # rotation preserves norms
    np.testing.assert_allclose(
        np.linalg.norm(qr, axis=-1),
        np.full(gh * gw, np.linalg.norm(np.asarray(q[0, 0, 0]))),
        rtol=1e-5,
    )


def test_zoo_family_facts():
    """Config data that golden-parity depends on (timm facts that broke
    once): deit3 is no_embed_class, the plain clip_224.openai identifier
    computes STANDARD gelu in timm (its quickgelu twin is separate), and
    DINOv2 giant is packed SwiGLU with the official 4096 gate width."""
    d3 = get_model_config("deit3_base_patch16_224.fb_in1k")
    assert d3.no_embed_class and d3.num_pos_tokens == 196
    assert get_model_config("vit_base_patch16_clip_224.openai").act == "gelu"
    assert get_model_config(
        "vit_base_patch16_clip_quickgelu_224.openai").act == "quick_gelu"
    g = get_model_config("vit_giant_patch14_dinov2.lvd142m")
    assert g.act == "swiglu_packed" and g.glu_hidden == 4096
    gr = get_model_config("vit_giant_patch14_reg4_dinov2.lvd142m")
    assert gr.act == "swiglu_packed" and gr.glu_hidden == 4096
