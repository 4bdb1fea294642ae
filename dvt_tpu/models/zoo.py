"""Backbone zoo: static configurations for every ViT family the reference
supports (dvt/models/vit_wrapper.py:15-56).

Where the reference leans on ``timm.create_model`` + ``resolve_model_data_config``
at runtime, we record the architecture and data statistics statically - the
TPU build compiles one program per (model, stride, input-size) and wants all
of this to be trace-time constants.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional, Tuple

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
INCEPTION_MEAN = (0.5, 0.5, 0.5)
INCEPTION_STD = (0.5, 0.5, 0.5)
OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Static architecture + data config for one pretrained backbone."""

    name: str
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int
    pretrain_img_size: int = 224
    mlp_ratio: float = 4.0
    class_token: bool = True
    reg_tokens: int = 0
    no_embed_class: bool = False
    pre_norm: bool = False  # CLIP: LayerNorm before the blocks
    init_values: Optional[float] = None  # LayerScale init (DINOv2, DeiT-III)
    norm_eps: float = 1e-6
    act: str = "gelu"  # "gelu" | "quick_gelu" | "swiglu_packed"
    glu_hidden: Optional[int] = None  # gate width for swiglu_packed
    # (DINOv2 giant: 4096 - official SwiGLUFFNFused w12 1536->8192)
    qkv_bias: bool = True
    # EVA02 family
    eva_arch: bool = False  # swiglu MLP w/ inner norm, separate qkv, rope
    use_rope: bool = True  # only read when eva_arch
    # EVA-CLIP variants (timm scale_attn_inner): LayerNorm over the merged
    # head output before attn.proj
    attn_inner_norm: bool = False
    rope_ref_feat_shape: Optional[Tuple[int, int]] = None
    mean: Tuple[float, float, float] = IMAGENET_DEFAULT_MEAN
    std: Tuple[float, float, float] = IMAGENET_DEFAULT_STD

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.class_token else 0) + self.reg_tokens

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def pretrain_grid(self) -> Tuple[int, int]:
        g = self.pretrain_img_size // self.patch_size
        return (g, g)

    @property
    def num_pos_tokens(self) -> int:
        n = self.pretrain_grid[0] * self.pretrain_grid[1]
        if not self.no_embed_class:
            n += self.num_prefix_tokens
        return n


_SIZES = {
    "small": dict(embed_dim=384, depth=12, num_heads=6),
    "base": dict(embed_dim=768, depth=12, num_heads=12),
    "large": dict(embed_dim=1024, depth=24, num_heads=16),
    "huge": dict(embed_dim=1280, depth=32, num_heads=16),
    "giant": dict(embed_dim=1536, depth=40, num_heads=24),
}


def _dino_v1(size, patch):
    return ViTConfig(
        name=f"vit_{size}_patch{patch}_224.dino",
        patch_size=patch,
        **_SIZES[size],
    )


def _dinov2(size, patch=14, reg=0):
    reg_str = "_reg4" if reg else ""
    kw = dict(_SIZES[size])
    if size == "giant":
        # DINOv2 giant uses the packed SwiGLU MLP (official
        # SwiGLUFFNFused: w12 1536->8192, w3 4096->1536; timm
        # SwiGLUPacked loads the same weights)
        kw.update(act="swiglu_packed", glu_hidden=4096)
    return ViTConfig(
        name=f"vit_{size}_patch{patch}{reg_str}_dinov2.lvd142m",
        patch_size=patch,
        pretrain_img_size=518,
        init_values=1e-5,
        reg_tokens=reg,
        no_embed_class=bool(reg),
        **kw,
    )


def _mae(size, patch):
    return ViTConfig(
        name=f"vit_{size}_patch{patch}_224.mae", patch_size=patch, **_SIZES[size]
    )


_CONFIGS = {}


def _register(cfg: ViTConfig):
    _CONFIGS[cfg.name] = cfg


# --- DINOv1 ---
for s, p in [("small", 8), ("small", 16), ("base", 8), ("base", 16)]:
    _register(_dino_v1(s, p))
# --- DINOv2 (+register variants) ---
for s in ["small", "base", "large", "giant"]:
    _register(_dinov2(s))
    _register(_dinov2(s, reg=4))
# --- MAE ---
for s, p in [("base", 16), ("large", 16), ("huge", 14)]:
    _register(_mae(s, p))
# --- CLIP ---
_register(
    ViTConfig(
        name="vit_base_patch16_clip_384.laion2b_ft_in12k_in1k",
        patch_size=16,
        pretrain_img_size=384,
        pre_norm=True,
        norm_eps=1e-5,
        mean=OPENAI_CLIP_MEAN,
        std=OPENAI_CLIP_STD,
        **_SIZES["base"],
    )
)
_register(
    ViTConfig(
        name="vit_base_patch16_clip_224.openai",
        patch_size=16,
        pre_norm=True,
        norm_eps=1e-5,
        # timm's vit_base_patch16_clip_224 applies STANDARD GELU even
        # with .openai weights (its QuickGELU-correct twin is the
        # separate _quickgelu_ identifier below) - the reference loads
        # this exact identifier through timm, so parity means gelu here
        act="gelu",
        mean=OPENAI_CLIP_MEAN,
        std=OPENAI_CLIP_STD,
        **_SIZES["base"],
    )
)
_register(
    ViTConfig(
        name="vit_base_patch16_clip_quickgelu_224.openai",
        patch_size=16,
        pre_norm=True,
        norm_eps=1e-5,
        act="quick_gelu",  # the activation OpenAI CLIP actually trained
        mean=OPENAI_CLIP_MEAN,
        std=OPENAI_CLIP_STD,
        **_SIZES["base"],
    )
)
# --- EVA02 ---
_register(
    ViTConfig(
        name="eva02_base_patch16_clip_224.merged2b",
        patch_size=16,
        eva_arch=True,
        attn_inner_norm=True,  # EVA-CLIP: timm scale_attn_inner=True
        mlp_ratio=4 * 2 / 3,
        rope_ref_feat_shape=(16, 16),
        mean=OPENAI_CLIP_MEAN,
        std=OPENAI_CLIP_STD,
        **_SIZES["base"],
    )
)
# --- DeiT-III ---
_register(
    ViTConfig(
        name="deit3_base_patch16_224.fb_in1k",
        patch_size=16,
        init_values=1e-6,
        # timm deit3_* set no_embed_class=True: pos_embed covers ONLY the
        # 196 patch tokens; the cls token gets no position embedding
        no_embed_class=True,
        **_SIZES["base"],
    )
)
# --- AugReg supervised ---
_register(
    ViTConfig(
        name="vit_base_patch16_384.augreg_in21k_ft_in1k",
        patch_size=16,
        pretrain_img_size=384,
        mean=INCEPTION_MEAN,
        std=INCEPTION_STD,
        **_SIZES["base"],
    )
)

MODEL_LIST = sorted(_CONFIGS)


def register_model(cfg: ViTConfig) -> None:
    """Register a custom backbone config (tests, new families)."""
    _CONFIGS[cfg.name] = cfg
    if cfg.name not in MODEL_LIST:
        MODEL_LIST.append(cfg.name)


def get_model_config(model_identifier: str) -> ViTConfig:
    if model_identifier not in _CONFIGS:
        raise KeyError(
            f"Model {model_identifier!r} not registered; known: {MODEL_LIST}"
        )
    return _CONFIGS[model_identifier]


def patch_size_of(model_identifier: str) -> int:
    m = re.search(r"patch(\d+)", model_identifier)
    if not m:
        raise ValueError(f"cannot parse patch size from {model_identifier}")
    return int(m.group(1))
