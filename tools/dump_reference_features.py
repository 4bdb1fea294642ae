"""Golden-feature dumper: run in a torch+timm environment to produce the
parity fixtures consumed by tests/test_golden.py.

For each (model, stride) case it saves
  golden/<model>__s<stride>.npz  with
    feats:   (h, w, C) last-layer normalized feature map (timm
             forward_intermediates, norm=True, NCHW -> HWC)
    pixels:  the exact normalized input tensor fed to the model (H, W, 3)
  golden/<model>__weights.pth    the timm state dict (consumed by
    models.convert.convert_vit_state_dict so the JAX forward runs the SAME
    weights).

Default case list = one representative per backbone family in
dvt/models/vit_wrapper.py MODEL_LIST plus the DVT stride override (14->7,
vit_wrapper.py:78-91) - the stride case monkey-patches dynamic_feat_size
exactly like the reference so forward_intermediates reshapes correctly.

Usage (requires timm; NOT available in the TPU build box):
  python tools/dump_reference_features.py --image demo/cat.jpg \
      --out tests/golden
"""

import argparse
import os

import numpy as np

# (timm model name, stride, input size) - one per family + stride override
DEFAULT_CASES = [
    ("vit_base_patch14_dinov2.lvd142m", 14, 518),
    ("vit_base_patch14_dinov2.lvd142m", 7, 518),  # DVT stride override
    ("vit_base_patch14_reg4_dinov2.lvd142m", 14, 518),
    ("vit_base_patch16_224.dino", 16, 512),
    ("vit_base_patch16_224.mae", 16, 512),
    ("vit_base_patch16_clip_384.laion2b_ft_in12k_in1k", 16, 512),
    ("eva02_base_patch16_clip_224.merged2b", 16, 512),
    ("deit3_base_patch16_224.fb_in1k", 16, 512),
    ("vit_base_patch16_384.augreg_in21k_ft_in1k", 16, 512),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--out", default="tests/golden")
    p.add_argument("--models", nargs="+", default=None,
                   help="override: model names (used with --stride)")
    p.add_argument("--stride", type=int, default=None)
    p.add_argument("--input_size", type=int, default=518)
    args = p.parse_args()

    import timm
    import timm.data
    import torch
    from PIL import Image

    if args.models:
        cases = [(m, args.stride, args.input_size) for m in args.models]
    else:
        cases = DEFAULT_CASES

    os.makedirs(args.out, exist_ok=True)
    for name, stride, input_size in cases:
        model = timm.create_model(
            name, pretrained=True, num_classes=0, dynamic_img_size=True
        ).eval()
        patch = model.patch_embed.proj.stride[0]
        stride = stride or patch
        if stride != patch:
            # the DVT stride override (dvt/models/vit_wrapper.py:78-91)
            model.patch_embed.proj.stride = [stride, stride]

            def dynamic_feat_size(img_size, patch=patch, s=stride):
                return tuple((i - patch) // s + 1 for i in img_size)

            model.patch_embed.dynamic_feat_size = dynamic_feat_size
        cfg = timm.data.resolve_model_data_config(model=model)
        tf = timm.data.create_transform(**cfg, is_training=False)
        img = Image.open(args.image).convert("RGB").resize(
            (input_size, input_size), Image.BICUBIC
        )
        x = tf.transforms[-1](
            torch.from_numpy(
                np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
            )
        )[None]
        with torch.no_grad():
            feats = model.forward_intermediates(
                x, [len(model.blocks) - 1], norm=True, output_fmt="NCHW",
                intermediates_only=True,
            )[-1]
        out = os.path.join(args.out, f"{name}__s{stride}.npz")
        np.savez(
            out,
            feats=feats[0].permute(1, 2, 0).numpy(),
            pixels=x[0].permute(1, 2, 0).numpy(),
        )
        # the converted-ready state dict (one per model)
        wpath = os.path.join(args.out, f"{name}__weights.pth")
        if not os.path.exists(wpath):
            torch.save(model.state_dict(), wpath)
        print("wrote", out)


if __name__ == "__main__":
    main()
