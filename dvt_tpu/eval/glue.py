"""Backbone-to-probe glue: the three feature-extraction modes of
evaluate_dense_tasks.py (:183-214) as pure feature functions.

  raw ViT          -> last-layer feature map
  ViT + denoiser   -> stage-2 denoised map
  distilled ViT    -> last-layer map of the distilled backbone (same as raw
                      mode with swapped params)

plus CenterPadding (eval_utils/misc.py:19-35): symmetric padding of the
input image to a multiple of the patch size before the backbone.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def center_pad(x: Array, multiple: int) -> Array:
    """Pad (B, H, W, C) so H and W are multiples of ``multiple``; symmetric
    (floor/ceil) like torch F.pad in CenterPadding."""
    h, w = x.shape[1:3]

    def pads(size):
        new = -(-size // multiple) * multiple
        total = new - size
        return total // 2, total - total // 2

    (t, b), (l, r) = pads(h), pads(w)
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


def data_sharded_call(mesh, fn, images: Array, *args) -> Array:
    """Run ``fn(images, *args)`` with the batch axis sharded over the
    mesh's 'data' axis, padding a non-divisible batch with its last row
    (sharding one is a hard error) and trimming the result back.

    The one shared implementation of the val-inference pattern the
    reference gets from 8-way MMDistributedDataParallel eval
    (evaluation/depth/apis/train.py:61-66); used by the seg and depth
    probes' batched predict paths."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        return fn(images, *args)
    n = images.shape[0]
    pad = (-n) % mesh.shape["data"]
    if pad:
        images = jnp.concatenate(
            [images, jnp.repeat(images[-1:], pad, axis=0)], axis=0)
    images = jax.device_put(images, NamedSharding(mesh, P("data")))
    return fn(images, *args)[:n]


def make_feature_fn(
    vit_wrapper,
    denoiser=None,
    denoiser_params=None,
    vit_params=None,
    pad_multiple: Optional[int] = None,
    return_cls_token: bool = False,
    out_indices=None,
):
    """Build (feature_fn(params, images) -> (B, h, w, C), params) for the
    probes. Backbone params are threaded as explicit jit arguments - baking
    a ViT-B as closure constants inflates the serialized program past
    compile-service request limits.

    ``return_cls_token``: the reference depth probes feed the head
    (patch_map, cls_token) pairs (output_cls_token=True at
    vitb_nyu_linear_config.py:147; format_output at
    evaluation/eval_utils/misc.py:159-188 keeps prefix token 0). With this
    flag the returned fn yields (feats, cls) where cls is (B, C). In the
    denoiser mode the cls token is the raw ViT's - the single-block
    denoiser only processes patch tokens (dvt/models/online_denoiser.py:
    62-104).

    ``out_indices``: tap MULTIPLE blocks (e.g. (2, 5, 8, 11) for a DPT
    head, or (8, 9, 10, 11) for seg resize_concat) — the fn then returns
    a LIST of maps. The denoiser, when given, applies to the LAST tap
    only (stage 2 trains on last-layer features)."""
    params = {
        "vit": vit_params if vit_params is not None else vit_wrapper.params,
        "denoiser": denoiser_params,
    }
    multi = out_indices is not None
    n = list(out_indices) if multi else [vit_wrapper.last_layer_index]

    def fn(p, images: Array):
        x = images
        if pad_multiple:
            x = center_pad(x, pad_multiple)
        out = vit_wrapper.get_intermediate_layers(
            x, n=n, norm=True, params=p["vit"],
            return_prefix_tokens=return_cls_token,
        )
        if return_cls_token:
            maps = [o[0] for o in out]
            cls = out[-1][1][:, 0]
        else:
            maps = list(out)
        if denoiser is not None:
            maps[-1] = denoiser.apply({"params": p["denoiser"]}, maps[-1])
        feats = maps if multi else maps[-1]
        feats = jax.lax.stop_gradient(feats)
        if return_cls_token:
            return feats, jax.lax.stop_gradient(cls)
        return feats

    return fn, params
