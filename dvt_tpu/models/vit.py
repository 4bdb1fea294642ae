"""TPU-native Vision Transformer backbone zoo.

Re-designs the reference's ``PretrainedViTWrapper`` (dvt/models/vit_wrapper.py)
around JAX/XLA instead of timm/torch:

  * NHWC throughout (TPU conv layout); strided patch embedding expressed as a
    VALID conv whose stride may be smaller than the kernel, reproducing the
    reference's stride-override + ``dynamic_feat_size`` monkey-patch
    (vit_wrapper.py:78-91): feature grid = (H - P) // S + 1.
  * Absolute pos embeds are bicubically resampled to the runtime grid inside
    the traced function (ops/resample.py), matching timm's
    ``dynamic_img_size=True`` path.
  * ``forward_intermediates`` taps arbitrary block outputs and applies the
    final norm to them, mirroring timm semantics the reference relies on
    (vit_wrapper.py:122-143).
  * bf16-friendly: a ``dtype`` knob runs all matmuls in bf16 on the MXU while
    parameters and layernorm statistics stay fp32.

Families covered: DINOv1/v2 (+registers, LayerScale), MAE, DeiT-III, CLIP
(pre-norm, QuickGELU), AugReg, and EVA02 (separate q/k/v, SwiGLU MLP with
inner LayerNorm, axial 2-D rotary embeddings).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvt_tpu.models.zoo import ViTConfig, get_model_config
from dvt_tpu.ops.patch_embed import patch_embed
from dvt_tpu.ops.resample import resample_abs_pos_embed

Array = jax.Array


def _act(name: str):
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(f"unknown activation {name}")


def sdpa(q: Array, k: Array, v: Array, precision=None,
         token_shard=None) -> Array:
    """Scaled dot-product attention over (B, N, heads, head_dim).

    Plain einsum formulation: XLA fuses this well on TPU, softmax runs in
    fp32 for bf16 inputs, and ``precision`` controls MXU passes (None = fast
    bf16 inputs; "highest" = fp32-faithful for checkpoint-parity paths).

    ``token_shard``: optional (mesh, axis) pair — sequence parallelism.
    The QUERY-token dim of the score tensor is sharded over ``axis`` (k/v
    stay whole per device via an XLA all-gather), so per-device score
    memory is B*H*(N/m)*N instead of B*H*N^2. The softmax reduction is
    along the unsharded key dim, so the partitioned program is exactly
    the unpartitioned math (no collective inside the softmax).
    """
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=precision)
    if token_shard is not None:
        from dvt_tpu.parallel.sharding import token_constraint

        scores = token_constraint(scores, *token_shard, dim=2)
    scores = (scores * scale).astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=precision)
    if token_shard is not None:
        out = token_constraint(out, *token_shard, dim=1)
    return out


class LayerScale(nn.Module):
    dim: int
    init_values: float

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_values), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


class Mlp(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        dense = lambda n, name: nn.Dense(
            n, dtype=self.dtype, precision=self.precision, name=name
        )
        if self.cfg.act == "swiglu_packed":
            # timm SwiGLUPacked / official DINOv2 SwiGLUFFNFused (giant):
            # one packed fc1 -> chunk 2 -> silu(x1) * x2 -> fc2. Geometry
            # comes from cfg.glu_hidden (DINOv2 giant: w12 1536->8192,
            # w3 4096->1536); the packed fc1/fc2 names match the timm
            # state dict so the generic converter maps it unchanged.
            hidden = self.cfg.glu_hidden or int(
                self.cfg.embed_dim * self.cfg.mlp_ratio * 2 / 3)
            x = dense(2 * hidden, "fc1")(x)
            x1, x2 = jnp.split(x, 2, axis=-1)
            x = nn.silu(x1) * x2
            x = dense(self.cfg.embed_dim, "fc2")(x)
            return x
        hidden = int(self.cfg.embed_dim * self.cfg.mlp_ratio)
        x = dense(hidden, "fc1")(x)
        x = _act(self.cfg.act)(x)
        x = dense(self.cfg.embed_dim, "fc2")(x)
        return x


class SwiGLU(nn.Module):
    """EVA02-style gated MLP with an inner LayerNorm (timm SwiGLU, scale_mlp)."""

    cfg: ViTConfig
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        hidden = int(self.cfg.embed_dim * self.cfg.mlp_ratio)
        dense = lambda n, name: nn.Dense(
            n, dtype=self.dtype, precision=self.precision, name=name
        )
        g = dense(hidden, "fc1_g")(x)
        h = dense(hidden, "fc1_x")(x)
        x = nn.silu(g) * h
        x = nn.LayerNorm(epsilon=self.cfg.norm_eps, dtype=self.dtype, name="norm")(x)
        x = dense(self.cfg.embed_dim, "fc2")(x)
        return x


def _rope_angles(grid: Tuple[int, int], head_dim: int,
                 ref_shape: Optional[Tuple[int, int]], temperature: float = 10000.0):
    """Axial 2-D rotary angles, concatenated [y-bands, x-bands] per position.

    Follows timm's RotaryEmbeddingCat layout used by EVA02: head_dim//4
    frequency bands per axis, each angle repeated twice consecutively.
    Returns (N, head_dim) sin and cos tables for the spatial tokens.
    """
    h, w = grid
    bands = head_dim // 4
    exps = jnp.arange(bands, dtype=jnp.float32) * 4.0 / head_dim
    inv_freq = 1.0 / (temperature**exps)  # (bands,)

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    if ref_shape is not None:
        ys = ys / max(h, 1) * ref_shape[0]
        xs = xs / max(w, 1) * ref_shape[1]

    ang_y = ys[:, None] * inv_freq[None, :]  # (h, bands)
    ang_x = xs[:, None] * inv_freq[None, :]  # (w, bands)
    ang_y = jnp.broadcast_to(ang_y[:, None, :], (h, w, bands))
    ang_x = jnp.broadcast_to(ang_x[None, :, :], (h, w, bands))
    ang = jnp.concatenate([ang_y, ang_x], axis=-1).reshape(h * w, 2 * bands)
    ang = jnp.repeat(ang, 2, axis=-1)  # (N, head_dim)
    return jnp.sin(ang), jnp.cos(ang)


def _apply_rope(x: Array, sin: Array, cos: Array, num_prefix: int) -> Array:
    """Rotate spatial tokens of (B, N, heads, head_dim); prefix passes through."""
    prefix, spatial = x[:, :num_prefix], x[:, num_prefix:]
    x1 = spatial[..., 0::2]
    x2 = spatial[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(spatial.shape)
    s = sin[None, :, None, :].astype(x.dtype)
    c = cos[None, :, None, :].astype(x.dtype)
    spatial = spatial * c + rotated * s
    return jnp.concatenate([prefix, spatial], axis=1)


class Attention(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.float32
    precision: Any = None
    attention_impl: str = "einsum"  # "einsum" | "flash" (Pallas, fwd+bwd)
    # Sequence parallelism (parallel/sharding.py token_constraint): shard
    # the token dim of activations + the query dim of the score tensor
    # over this mesh axis. einsum impl only — the Pallas flash kernel is
    # opaque to GSPMD (its memory win is intra-chip; this one is
    # cross-chip, for the stride<7 grids where even flash OOMs training).
    seq_mesh: Any = None
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, rope=None, num_prefix: int = 0):
        cfg = self.cfg
        b, n, c = x.shape
        nh, hd = cfg.num_heads, cfg.head_dim
        dense = lambda f, name, bias=True: nn.Dense(
            f, use_bias=bias, dtype=self.dtype, precision=self.precision,
            name=name,
        )
        if cfg.eva_arch:
            # EVA02 keeps q/k/v separate; k has no bias.
            q = dense(c, "q_proj")(x)
            k = dense(c, "k_proj", bias=False)(x)
            v = dense(c, "v_proj")(x)
        else:
            qkv = dense(3 * c, "qkv", bias=cfg.qkv_bias)(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, nh, hd)
        k = k.reshape(b, n, nh, hd)
        v = v.reshape(b, n, nh, hd)
        if rope is not None:
            sin, cos = rope
            q = _apply_rope(q, sin, cos, num_prefix)
            k = _apply_rope(k, sin, cos, num_prefix)
        if self.attention_impl == "flash":
            if self.seq_axis is not None:
                raise ValueError(
                    "sequence parallelism requires attention_impl='einsum' "
                    "(the Pallas kernel is opaque to GSPMD partitioning)")
            from dvt_tpu.ops.flash_attention import flash_attention

            out = flash_attention(q, k, v)
        else:
            token_shard = (
                (self.seq_mesh, self.seq_axis)
                if self.seq_axis is not None else None)
            out = sdpa(q, k, v, precision=self.precision,
                       token_shard=token_shard)
        out = out.reshape(b, n, c)
        if cfg.attn_inner_norm:
            # EVA-CLIP (timm scale_attn_inner): LayerNorm over the merged
            # head output before the output projection (timm attn.norm)
            out = nn.LayerNorm(
                epsilon=cfg.norm_eps, dtype=self.dtype, name="norm"
            )(out)
        out = dense(c, "proj")(out)
        return out


class Block(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.float32
    precision: Any = None
    attention_impl: str = "einsum"
    # ViTDet adapter mode (evaluation/vitdet/vision_transformer.py:98-117):
    # attention runs over non-overlapping window x window tiles of the
    # spatial grid (grid_hw); MLP and residuals stay global. 0 = global
    # attention. Requires a prefix-free sequence (num_prefix == 0).
    window_size: int = 0
    grid_hw: Optional[Tuple[int, int]] = None
    seq_mesh: Any = None
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, rope=None, num_prefix: int = 0):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.norm_eps, dtype=self.dtype, name=name
        )
        attn = Attention(
            cfg, dtype=self.dtype, precision=self.precision,
            attention_impl=self.attention_impl, name="attn",
            seq_mesh=self.seq_mesh, seq_axis=self.seq_axis,
        )
        y = ln("norm1")(x)
        if self.window_size > 0:
            assert num_prefix == 0 and rope is None, (
                "windowed attention runs on a prefix-free, rope-free "
                "spatial sequence (the reference adapter drops the class "
                "token: eval_utils/misc.py:116 output_prefix_tokens=False)")
            from dvt_tpu.ops.windows import (window_partition,
                                             window_unpartition)

            b, n, c = y.shape
            gh, gw = self.grid_hw
            ws = self.window_size
            wins, padded = window_partition(y.reshape(b, gh, gw, c), ws)
            a = attn(wins.reshape(wins.shape[0], ws * ws, c))
            a = a.reshape(-1, ws, ws, c)
            y = window_unpartition(a, ws, padded, (gh, gw))
            y = y.reshape(b, n, c)
        else:
            y = attn(y, rope=rope, num_prefix=num_prefix)
        if cfg.init_values is not None:
            y = LayerScale(cfg.embed_dim, cfg.init_values, name="ls1")(y)
        x = x + y
        y = ln("norm2")(x)
        mlp_cls = SwiGLU if cfg.eva_arch else Mlp
        y = mlp_cls(cfg, dtype=self.dtype, precision=self.precision, name="mlp")(y)
        if cfg.init_values is not None:
            y = LayerScale(cfg.embed_dim, cfg.init_values, name="ls2")(y)
        return x + y


class PatchEmbed(nn.Module):
    """Conv-layout params, im2col+matmul compute (see ops/patch_embed.py)."""

    cfg: ViTConfig
    stride: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        p = self.cfg.patch_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, 3, self.cfg.embed_dim),
        )
        # timm disables the patch-embed bias when pre-norm is used
        # (CLIP models): VisionTransformer(..., bias=not pre_norm)
        bias = (None if self.cfg.pre_norm else self.param(
            "bias", nn.initializers.zeros, (self.cfg.embed_dim,)))
        return patch_embed(
            x, kernel, bias, self.stride,
            precision=self.precision, out_dtype=self.dtype,
        )


class VisionTransformer(nn.Module):
    """Backbone with timm-compatible parameter structure and tap API."""

    cfg: ViTConfig
    stride: Optional[int] = None  # defaults to patch_size
    dtype: Any = jnp.float32
    precision: Any = None
    remat: bool = False
    attention_impl: str = "einsum"  # "flash" for long sequences (differentiable)
    # ViTDet detection adapter: window every block's attention over
    # window_size x window_size tiles and run the whole net PREFIX-FREE
    # (class/register tokens are dropped after embedding, matching the
    # reference adapter which never concatenates them in windowed mode -
    # evaluation/vitdet/vision_transformer.py:119-138 + eval_utils/
    # misc.py:116). 0 = standard global attention.
    window_size: int = 0
    # Sequence parallelism: shard the token dim of the residual stream
    # (and the query dim of every attention score tensor) over
    # ``seq_axis`` of ``seq_mesh``. All per-token ops (LN/MLP/projections)
    # then run partition-local; XLA inserts one k/v all-gather per
    # attention. This is the cross-chip activation-memory lever for
    # small-stride training (16k tokens at stride 4), complementary to
    # tensor parallelism (which shards params/heads instead).
    seq_mesh: Any = None
    seq_axis: Optional[str] = None

    def feat_grid(self, h: int, w: int) -> Tuple[int, int]:
        s = self.stride or self.cfg.patch_size
        p = self.cfg.patch_size
        return ((h - p) // s + 1, (w - p) // s + 1)

    @nn.compact
    def __call__(
        self,
        x: Array,
        indices: Optional[Sequence[int]] = None,
        norm: bool = True,
        return_prefix_tokens: bool = False,
    ):
        """Run the backbone, returning tapped intermediate feature maps.

        Args:
          x: (B, H, W, 3) normalized images, NHWC.
          indices: block indices to tap (default: last block only).
          norm: apply the final LayerNorm to tapped outputs (timm norm=True).
          return_prefix_tokens: also return (B, num_prefix, C) per tap.

        Returns:
          list of (B, H', W', C) maps - and a list of prefix-token arrays if
          ``return_prefix_tokens`` - one per tapped index, in index order.
        """
        cfg = self.cfg
        stride = self.stride or cfg.patch_size
        b, h, w, _ = x.shape
        gh, gw = self.feat_grid(h, w)
        if indices is None:
            indices = [cfg.depth - 1]
        indices = sorted(set(int(i) % cfg.depth for i in indices))

        # --- patch embedding: im2col + matmul (ops/patch_embed.py); stride
        # may undercut the kernel (the DVT stride override) ---
        x = PatchEmbed(cfg, dtype=self.dtype, precision=self.precision,
                       stride=stride, name="patch_embed")(x)
        x = x.reshape(b, gh * gw, cfg.embed_dim)

        # --- position embedding (resampled to the runtime grid) ---
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, cfg.num_pos_tokens, cfg.embed_dim),
        )
        num_prefix = cfg.num_prefix_tokens
        prefix_tokens = []
        if cfg.class_token:
            cls = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim)
            )
            prefix_tokens.append(jnp.broadcast_to(cls, (b, 1, cfg.embed_dim)))
        if cfg.reg_tokens:
            reg = self.param(
                "reg_token",
                nn.initializers.zeros,
                (1, cfg.reg_tokens, cfg.embed_dim),
            )
            prefix_tokens.append(
                jnp.broadcast_to(reg, (b, cfg.reg_tokens, cfg.embed_dim))
            )

        if cfg.no_embed_class:
            pe = resample_abs_pos_embed(
                pos_embed, (gh, gw), cfg.pretrain_grid, num_prefix_tokens=0
            )
            x = x + pe.astype(x.dtype)
            if prefix_tokens:
                x = jnp.concatenate(
                    [jnp.concatenate(prefix_tokens, 1).astype(x.dtype), x], axis=1
                )
        else:
            if prefix_tokens:
                x = jnp.concatenate(
                    [jnp.concatenate(prefix_tokens, 1).astype(x.dtype), x], axis=1
                )
            pe = resample_abs_pos_embed(
                pos_embed, (gh, gw), cfg.pretrain_grid,
                num_prefix_tokens=num_prefix,
            )
            x = x + pe.astype(x.dtype)

        if cfg.pre_norm:
            x = nn.LayerNorm(
                epsilon=cfg.norm_eps, dtype=self.dtype, name="norm_pre"
            )(x)

        rope = None
        if cfg.eva_arch and cfg.use_rope:
            rope = _rope_angles((gh, gw), cfg.head_dim, cfg.rope_ref_feat_shape)

        if self.window_size > 0:
            # windowed (ViTDet adapter) mode is prefix-free: the class/
            # register tokens are dropped AFTER their pos-embed rows were
            # handled above, mirroring the reference adapter's spatial-only
            # forward (vision_transformer.py:119-138)
            assert rope is None, "windowed attention: rope unsupported"
            if return_prefix_tokens:
                raise ValueError(
                    "windowed attention drops the class/register prefix; "
                    "return_prefix_tokens/return_cls_token is unavailable "
                    "with window_size > 0")
            x = x[:, num_prefix:]
            num_prefix = 0

        if self.seq_axis is not None:
            if self.window_size > 0:
                raise ValueError(
                    "sequence parallelism and windowed attention are "
                    "mutually exclusive (windows re-tile the token dim)")
            if self.attention_impl == "flash":
                raise ValueError(
                    "sequence parallelism requires attention_impl='einsum' "
                    "(the Pallas kernel is opaque to GSPMD partitioning)")
            from dvt_tpu.parallel.sharding import token_constraint

            x = token_constraint(x, self.seq_mesh, self.seq_axis, dim=1)

        # --- transformer blocks with taps ---
        block_cls = Block
        if self.remat:
            block_cls = nn.remat(Block, static_argnums=(3,))
        taps = {}
        for i in range(cfg.depth):
            x = block_cls(
                cfg, dtype=self.dtype, precision=self.precision,
                attention_impl=self.attention_impl,
                window_size=self.window_size, grid_hw=(gh, gw),
                seq_mesh=self.seq_mesh, seq_axis=self.seq_axis,
                name=f"blocks_{i}",
            )(x, rope, num_prefix)
            if i in indices:
                taps[i] = x

        final_norm = nn.LayerNorm(
            epsilon=cfg.norm_eps, dtype=self.dtype, name="norm"
        )
        # touch the LayerNorm unconditionally so its params always exist:
        # a module initialized with norm=False would otherwise produce a
        # tree that fails a later apply with norm=True (XLA dead-code-
        # eliminates the unused result when norm=False)
        _ = final_norm(x)

        feat_maps, prefix_out = [], []
        for i in indices:
            t = taps[i]
            if norm:
                t = final_norm(t)
            prefix_out.append(t[:, :num_prefix])
            spatial = t[:, num_prefix:].reshape(b, gh, gw, cfg.embed_dim)
            feat_maps.append(spatial)

        if return_prefix_tokens:
            return feat_maps, prefix_out
        return feat_maps


class ViTWrapper:
    """User-facing bundle of (config, module, params): the TPU-native
    equivalent of the reference's ``PretrainedViTWrapper``.

    Reference parity (dvt/models/vit_wrapper.py):
      * ``stride`` overrides the patch-embed stride (default 7 in stage 1).
      * ``n_output_dims`` / ``last_layer_index`` properties.
      * ``get_intermediate_layers(x, n, reshape, return_prefix_tokens, norm)``.
      * normalization statistics exposed for the data pipeline (the reference
        pulls these from the timm transform; here they live in the config).
    """

    def __init__(
        self,
        model_identifier: str = "vit_base_patch14_dinov2.lvd142m",
        stride: int = 7,
        params=None,
        checkpoint_path: Optional[str] = None,
        dtype: Any = jnp.float32,
        precision: Any = None,
        remat: bool = False,
        attention_impl: str = "einsum",
        window_size: int = 0,
        seed: int = 0,
    ):
        self.model_identifier = model_identifier
        self.cfg = get_model_config(model_identifier)
        self.stride = stride
        self.patch_size = self.cfg.patch_size
        self.module = VisionTransformer(
            self.cfg, stride=stride, dtype=dtype, precision=precision,
            remat=remat, attention_impl=attention_impl,
            window_size=window_size,
        )
        if checkpoint_path is not None:
            from dvt_tpu.models.convert import load_torch_vit_checkpoint

            params = load_torch_vit_checkpoint(checkpoint_path, self.cfg)
        if params is None:
            dummy = jnp.zeros(
                (1, self.cfg.patch_size * 2, self.cfg.patch_size * 2, 3),
                jnp.float32,
            )
            params = self.module.init(jax.random.PRNGKey(seed), dummy)["params"]
        self.params = params

    @property
    def n_output_dims(self) -> int:
        return self.cfg.embed_dim

    @property
    def num_blocks(self) -> int:
        return self.cfg.depth

    @property
    def last_layer_index(self) -> int:
        return self.cfg.depth - 1

    def feat_grid(self, h: int, w: int) -> Tuple[int, int]:
        return self.module.feat_grid(h, w)

    def get_intermediate_layers(
        self,
        x: Array,
        n: Union[int, Sequence[int]] = 1,
        reshape: bool = True,
        return_prefix_tokens: bool = False,
        norm: bool = True,
        params=None,
    ):
        """Tap intermediate layers; ``n``: last-n count or explicit indices."""
        if isinstance(n, int):
            indices = list(range(self.cfg.depth - n, self.cfg.depth))
        else:
            indices = list(n)
        out = self.module.apply(
            {"params": params if params is not None else self.params},
            x,
            indices=indices,
            norm=norm,
            return_prefix_tokens=return_prefix_tokens,
        )
        if return_prefix_tokens:
            feat_maps, prefix = out
        else:
            feat_maps, prefix = out, None
        if not reshape:  # NLC
            feat_maps = [
                f.reshape(f.shape[0], -1, f.shape[-1]) for f in feat_maps
            ]
        if return_prefix_tokens:
            return list(zip(feat_maps, prefix))
        return feat_maps

    def normalize_images(self, images: Array) -> Array:
        """(B,H,W,3) uint8 (0-255) or float in [0,1] -> standardized
        float (timm transform semantics: ToTensor /255 then mean/std)."""
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        mean = jnp.asarray(self.cfg.mean, jnp.float32)
        std = jnp.asarray(self.cfg.std, jnp.float32)
        return (images - mean) / std

    def denormalize_images(self, images: Array) -> Array:
        mean = jnp.asarray(self.cfg.mean, jnp.float32)
        std = jnp.asarray(self.cfg.std, jnp.float32)
        return images * std + mean
