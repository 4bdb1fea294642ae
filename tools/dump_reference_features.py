"""Golden-feature dumper: run in a torch+timm environment to produce the
parity fixtures consumed by tests/test_golden.py.

For each (model, stride, image) it saves
  golden/<model>__s<stride>.npz  with
    feats:   (h, w, C) last-layer normalized feature map (timm
             forward_intermediates, norm=True, NCHW -> HWC)
    pixels:  the exact normalized input tensor fed to the model (H, W, 3)
    pos_embed_resampled: the resampled pos-embed timm used (if exposed)

Usage (requires timm; NOT available in the TPU build box):
  python tools/dump_reference_features.py --image demo/cat.jpg \
      --out tests/golden --models vit_base_patch14_dinov2.lvd142m
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--out", default="tests/golden")
    p.add_argument("--models", nargs="+",
                   default=["vit_base_patch14_dinov2.lvd142m"])
    p.add_argument("--stride", type=int, default=14)
    p.add_argument("--input_size", type=int, default=518)
    args = p.parse_args()

    import timm
    import timm.data
    import torch
    from PIL import Image

    os.makedirs(args.out, exist_ok=True)
    for name in args.models:
        model = timm.create_model(
            name, pretrained=True, num_classes=0, dynamic_img_size=True
        ).eval()
        if args.stride != model.patch_embed.proj.stride[0]:
            model.patch_embed.proj.stride = [args.stride, args.stride]
        cfg = timm.data.resolve_model_data_config(model=model)
        tf = timm.data.create_transform(**cfg, is_training=False)
        img = Image.open(args.image).convert("RGB").resize(
            (args.input_size, args.input_size), Image.BICUBIC
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
        out = os.path.join(args.out, f"{name}__s{args.stride}.npz")
        np.savez(
            out,
            feats=feats[0].permute(1, 2, 0).numpy(),
            pixels=x[0].permute(1, 2, 0).numpy(),
        )
        # also dump the converted-ready state dict
        torch.save(model.state_dict(),
                   os.path.join(args.out, f"{name}__weights.pth"))
        print("wrote", out)


if __name__ == "__main__":
    main()
