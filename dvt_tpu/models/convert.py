"""Torch checkpoint conversion: timm/DVT ``.pth`` state dicts -> our pytrees.

The reference consumes timm-pretrained backbones and publishes torch
checkpoints in 4 flavors (README.md:153-161). This module maps those state
dicts onto the parameter structure of dvt_tpu.models.vit / online_denoiser:

  torch Linear  (out, in)        -> flax Dense kernel (in, out)
  torch Conv2d  (out, in, kh, kw)-> flax Conv kernel  (kh, kw, in, out)
  torch LayerNorm weight/bias    -> flax scale/bias

Only structural mapping happens here - no numerics - so it runs on CPU with
the baked-in torch and needs no timm.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from dvt_tpu.models.zoo import ViTConfig


def _t(x) -> np.ndarray:
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def _set(tree: Dict[str, Any], path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _linear(tree, dst, sd, src):
    _set(tree, f"{dst}/kernel", _t(sd[f"{src}.weight"]).T)
    if f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", _t(sd[f"{src}.bias"]))


def _layernorm(tree, dst, sd, src):
    _set(tree, f"{dst}/scale", _t(sd[f"{src}.weight"]))
    _set(tree, f"{dst}/bias", _t(sd[f"{src}.bias"]))


def convert_vit_state_dict(
    sd: Mapping[str, Any], cfg: ViTConfig, prefix: str = ""
) -> Dict[str, Any]:
    """Convert a timm VisionTransformer/Eva state dict to our ViT params."""
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    # The reference's PretrainedViTWrapper nests the timm model at "model."
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    p: Dict[str, Any] = {}
    w = _t(sd["patch_embed.proj.weight"])  # (C, 3, kh, kw)
    _set(p, "patch_embed/kernel", np.transpose(w, (2, 3, 1, 0)))
    # timm pre-norm (CLIP) models ship no patch-embed bias
    if "patch_embed.proj.bias" in sd:
        _set(p, "patch_embed/bias", _t(sd["patch_embed.proj.bias"]))
    _set(p, "pos_embed", _t(sd["pos_embed"]))
    if cfg.class_token:
        _set(p, "cls_token", _t(sd["cls_token"]))
    if cfg.reg_tokens:
        _set(p, "reg_token", _t(sd["reg_token"]))
    if cfg.pre_norm and "norm_pre.weight" in sd:
        _layernorm(p, "norm_pre", sd, "norm_pre")

    for i in range(cfg.depth):
        b = f"blocks.{i}"
        d = f"blocks_{i}"
        _layernorm(p, f"{d}/norm1", sd, f"{b}.norm1")
        _layernorm(p, f"{d}/norm2", sd, f"{b}.norm2")
        if cfg.eva_arch:
            _linear(p, f"{d}/attn/q_proj", sd, f"{b}.attn.q_proj")
            _linear(p, f"{d}/attn/k_proj", sd, f"{b}.attn.k_proj")
            _linear(p, f"{d}/attn/v_proj", sd, f"{b}.attn.v_proj")
            if f"{b}.attn.norm.weight" in sd:
                # EVA-CLIP scale_attn_inner: LN before attn.proj
                _layernorm(p, f"{d}/attn/norm", sd, f"{b}.attn.norm")
            _linear(p, f"{d}/attn/proj", sd, f"{b}.attn.proj")
            _linear(p, f"{d}/mlp/fc1_g", sd, f"{b}.mlp.fc1_g")
            _linear(p, f"{d}/mlp/fc1_x", sd, f"{b}.mlp.fc1_x")
            _layernorm(p, f"{d}/mlp/norm", sd, f"{b}.mlp.norm")
            _linear(p, f"{d}/mlp/fc2", sd, f"{b}.mlp.fc2")
        else:
            _linear(p, f"{d}/attn/qkv", sd, f"{b}.attn.qkv")
            _linear(p, f"{d}/attn/proj", sd, f"{b}.attn.proj")
            _linear(p, f"{d}/mlp/fc1", sd, f"{b}.mlp.fc1")
            _linear(p, f"{d}/mlp/fc2", sd, f"{b}.mlp.fc2")
        if cfg.init_values is not None:
            _set(p, f"{d}/ls1/gamma", _t(sd[f"{b}.ls1.gamma"]))
            _set(p, f"{d}/ls2/gamma", _t(sd[f"{b}.ls2.gamma"]))
    _layernorm(p, "norm", sd, "norm")
    return p


def convert_denoiser_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert the reference stage-2 ``{"denoiser": ...}`` payload
    (main_denoiser.py:239-264, timm Block names) to Denoiser params."""
    sd = {k: v for k, v in sd.items() if not k.startswith("vit.")}
    p: Dict[str, Any] = {}
    if "pos_embed" in sd:
        _set(p, "pos_embed", _t(sd["pos_embed"]))
    # single-block checkpoints use "denoiser.<sub>", multi-block "denoiser.N.<sub>"
    block_keys = [k for k in sd if k.startswith("denoiser.")]
    multi = any(k.split(".")[1].isdigit() for k in block_keys)

    def blocks():
        if multi:
            ids = sorted({int(k.split(".")[1]) for k in block_keys})
            for i in ids:
                yield i, f"denoiser.{i}"
        else:
            yield 0, "denoiser"

    for i, b in blocks():
        d = f"blocks_{i}"
        _layernorm(p, f"{d}/norm1", sd, f"{b}.norm1")
        _layernorm(p, f"{d}/norm2", sd, f"{b}.norm2")
        _linear(p, f"{d}/attn/qkv", sd, f"{b}.attn.qkv")
        _linear(p, f"{d}/attn/proj", sd, f"{b}.attn.proj")
        _linear(p, f"{d}/mlp/fc1", sd, f"{b}.mlp.fc1")
        _linear(p, f"{d}/mlp/fc2", sd, f"{b}.mlp.fc2")
    return p


def _conv(tree, dst, sd, src):
    """torch Conv2d (out, in, kh, kw) -> flax Conv kernel (kh, kw, in, out)."""
    _set(tree, f"{dst}/kernel", _t(sd[f"{src}.weight"]).transpose(2, 3, 1, 0))
    if f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", _t(sd[f"{src}.bias"]))


def convert_dpt_state_dict(sd: Mapping[str, Any],
                           prefix: str = "decode_head.") -> Dict[str, Any]:
    """Convert a reference DPTHead torch state dict (evaluation/depth/
    models/decode_heads/dpt_head.py) to our ``DPTHead(variant="reference")``
    params.

    Mapping (reference module -> our param name):
      reassemble_blocks.projects.{i}.conv   -> reassemble_{i}_proj
      reassemble_blocks.resize_layers.{0,1} -> reassemble_{0,1}_deconv_*
        (torch ConvTranspose2d weight keeps its native (in, out, kH, kW)
        layout — block_deconv consumes it directly)
      reassemble_blocks.resize_layers.3     -> reassemble_3_down
      convs.{i}.conv                        -> scratch_{i}
      fusion_blocks.{i} (0 = coarsest)      -> fusion_{3-i}
      project.conv                          -> project_out
      conv_depth.head.{0,2,4}               -> head_conv{1,2,3}
    """
    if prefix:
        pref = {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}
        sd = pref or dict(sd)
    p: Dict[str, Any] = {}
    for i in range(4):
        _conv(p, f"reassemble_{i}_proj", sd,
              f"reassemble_blocks.projects.{i}.conv")
        _conv(p, f"scratch_{i}", sd, f"convs.{i}.conv")
    for i, k in ((0, 4), (1, 2)):  # (stage, expected deconv kernel size)
        w = sd[f"reassemble_blocks.resize_layers.{i}.weight"]
        if tuple(w.shape[-2:]) != (k, k):
            raise ValueError(
                f"resize_layers.{i} deconv kernel is {tuple(w.shape)}, "
                f"expected {k}x{k} (dpt_head.py:88-108)")
        _set(p, f"reassemble_{i}_deconv_kernel", _t(w))
        _set(p, f"reassemble_{i}_deconv_bias",
             _t(sd[f"reassemble_blocks.resize_layers.{i}.bias"]))
    _conv(p, "reassemble_3_down", sd, "reassemble_blocks.resize_layers.3")
    for ref_i in range(4):
        ours = f"fusion_{3 - ref_i}"
        base = f"fusion_blocks.{ref_i}"
        _conv(p, f"{ours}/project", sd, f"{base}.project.conv")
        units = ("res_conv_unit2",) if ref_i == 0 else (
            "res_conv_unit1", "res_conv_unit2")
        for u in units:
            _conv(p, f"{ours}/rcu{u[-1]}/conv1", sd, f"{base}.{u}.conv1.conv")
            _conv(p, f"{ours}/rcu{u[-1]}/conv2", sd, f"{base}.{u}.conv2.conv")
    _conv(p, "project_out", sd, "project.conv")
    for ours, idx in (("head_conv1", 0), ("head_conv2", 2), ("head_conv3", 4)):
        _conv(p, ours, sd, f"conv_depth.head.{idx}")
    return p


def load_torch_vit_checkpoint(path: str, cfg: ViTConfig) -> Dict[str, Any]:
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict):
        for key in ("model", "state_dict", "module"):
            if key in payload and isinstance(payload[key], dict):
                payload = payload[key]
                break
    return convert_vit_state_dict(payload, cfg)


def export_denoiser_state_dict(params: Mapping[str, Any]):
    """Inverse of convert_denoiser_state_dict: our Denoiser params -> a
    reference-style torch state dict ({"denoiser": ...} payload contents),
    so stage-2 checkpoints trained here load in the reference codebase."""
    import torch

    sd = {}
    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    if "pos_embed" in params:
        sd["pos_embed"] = t(params["pos_embed"])
    blocks = sorted(k for k in params if k.startswith("blocks_"))
    multi = len(blocks) > 1
    for k in blocks:
        i = int(k.split("_")[1])
        b = f"denoiser.{i}" if multi else "denoiser"
        p = params[k]
        sd[f"{b}.norm1.weight"] = t(p["norm1"]["scale"])
        sd[f"{b}.norm1.bias"] = t(p["norm1"]["bias"])
        sd[f"{b}.norm2.weight"] = t(p["norm2"]["scale"])
        sd[f"{b}.norm2.bias"] = t(p["norm2"]["bias"])
        sd[f"{b}.attn.qkv.weight"] = t(p["attn"]["qkv"]["kernel"]).T.contiguous()
        sd[f"{b}.attn.qkv.bias"] = t(p["attn"]["qkv"]["bias"])
        sd[f"{b}.attn.proj.weight"] = t(p["attn"]["proj"]["kernel"]).T.contiguous()
        sd[f"{b}.attn.proj.bias"] = t(p["attn"]["proj"]["bias"])
        sd[f"{b}.mlp.fc1.weight"] = t(p["mlp"]["fc1"]["kernel"]).T.contiguous()
        sd[f"{b}.mlp.fc1.bias"] = t(p["mlp"]["fc1"]["bias"])
        sd[f"{b}.mlp.fc2.weight"] = t(p["mlp"]["fc2"]["kernel"]).T.contiguous()
        sd[f"{b}.mlp.fc2.bias"] = t(p["mlp"]["fc2"]["bias"])
    return sd


def export_vit_state_dict(params: Mapping[str, Any], cfg: ViTConfig):
    """Our ViT params -> timm-style state dict (stage-3 distilled backbones
    consumable by the reference / timm loaders)."""
    import torch

    sd = {}
    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    sd["patch_embed.proj.weight"] = t(
        np.transpose(np.asarray(params["patch_embed"]["kernel"]), (3, 2, 0, 1))
    )
    if "bias" in params["patch_embed"]:  # absent for pre-norm (CLIP)
        sd["patch_embed.proj.bias"] = t(params["patch_embed"]["bias"])
    sd["pos_embed"] = t(params["pos_embed"])
    if cfg.class_token:
        sd["cls_token"] = t(params["cls_token"])
    if cfg.reg_tokens:
        sd["reg_token"] = t(params["reg_token"])
    if cfg.pre_norm and "norm_pre" in params:
        sd["norm_pre.weight"] = t(params["norm_pre"]["scale"])
        sd["norm_pre.bias"] = t(params["norm_pre"]["bias"])
    for i in range(cfg.depth):
        p = params[f"blocks_{i}"]
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = t(p["norm1"]["scale"])
        sd[f"{b}.norm1.bias"] = t(p["norm1"]["bias"])
        sd[f"{b}.norm2.weight"] = t(p["norm2"]["scale"])
        sd[f"{b}.norm2.bias"] = t(p["norm2"]["bias"])
        if cfg.eva_arch:
            for ours, theirs in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                                 ("v_proj", "v_proj"), ("proj", "proj")):
                sd[f"{b}.attn.{theirs}.weight"] = t(
                    p["attn"][ours]["kernel"]).T.contiguous()
                if "bias" in p["attn"][ours]:
                    sd[f"{b}.attn.{theirs}.bias"] = t(p["attn"][ours]["bias"])
            if "norm" in p["attn"]:  # EVA-CLIP scale_attn_inner
                sd[f"{b}.attn.norm.weight"] = t(p["attn"]["norm"]["scale"])
                sd[f"{b}.attn.norm.bias"] = t(p["attn"]["norm"]["bias"])
            for name in ("fc1_g", "fc1_x", "fc2"):
                sd[f"{b}.mlp.{name}.weight"] = t(
                    p["mlp"][name]["kernel"]).T.contiguous()
                sd[f"{b}.mlp.{name}.bias"] = t(p["mlp"][name]["bias"])
            sd[f"{b}.mlp.norm.weight"] = t(p["mlp"]["norm"]["scale"])
            sd[f"{b}.mlp.norm.bias"] = t(p["mlp"]["norm"]["bias"])
        else:
            sd[f"{b}.attn.qkv.weight"] = t(p["attn"]["qkv"]["kernel"]).T.contiguous()
            if "bias" in p["attn"]["qkv"]:
                sd[f"{b}.attn.qkv.bias"] = t(p["attn"]["qkv"]["bias"])
            sd[f"{b}.attn.proj.weight"] = t(p["attn"]["proj"]["kernel"]).T.contiguous()
            sd[f"{b}.attn.proj.bias"] = t(p["attn"]["proj"]["bias"])
            sd[f"{b}.mlp.fc1.weight"] = t(p["mlp"]["fc1"]["kernel"]).T.contiguous()
            sd[f"{b}.mlp.fc1.bias"] = t(p["mlp"]["fc1"]["bias"])
            sd[f"{b}.mlp.fc2.weight"] = t(p["mlp"]["fc2"]["kernel"]).T.contiguous()
            sd[f"{b}.mlp.fc2.bias"] = t(p["mlp"]["fc2"]["bias"])
        if cfg.init_values is not None:
            sd[f"{b}.ls1.gamma"] = t(p["ls1"]["gamma"])
            sd[f"{b}.ls2.gamma"] = t(p["ls2"]["gamma"])
    sd["norm.weight"] = t(params["norm"]["scale"])
    sd["norm.bias"] = t(params["norm"]["bias"])
    return sd
