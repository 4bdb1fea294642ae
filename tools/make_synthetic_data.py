"""Generate tiny synthetic datasets in the reference's on-disk layouts.

The build sandbox has no VOC2012 / ADE20k / NYU-Depth-v2 mounts (and no
network), so the real-data quality numbers of BASELINE.md cannot be
reproduced here. This tool fabricates datasets that exercise the SAME disk
contracts the reference uses, so the full pipeline - stage 1 feature dumps,
stage 2 training, the seg/depth linear probes, slide inference, metric
aggregation - runs end to end exactly as it would on the real data:

  * VOC2012 layout (JPEGImages/, SegmentationClass/ grayscale-label pngs,
    ImageSets/Segmentation/{train,val}.txt) - reference
    evaluation/configs/vitb_voc2012_linear_config.py:27-47.
  * NYU layout (640x480 rgb jpgs + uint16 mm depth pngs, split files with
    'rgb depth focal' lines) - reference evaluation/depth/datasets/nyu.py:96.
  * a stage-1 image list file (one path per line) -
    main_img_denoising.py --img_path contract.

Images are procedural: class-colored geometric shapes over textured
backgrounds (so a linear probe on ViT features is learnable), depth from a
slanted plane plus per-shape offsets.
"""

import argparse
import os

import numpy as np
from PIL import Image


def _texture(rng, h, w, base, amp=18):
    img = np.zeros((h, w, 3), np.float32) + np.asarray(base, np.float32)
    # low-frequency noise via upsampled coarse grid
    coarse = rng.normal(0, amp, (h // 16 + 2, w // 16 + 2, 3))
    img += np.asarray(
        Image.fromarray(
            np.clip(coarse + 128, 0, 255).astype(np.uint8)
        ).resize((w, h), Image.BILINEAR),
        np.float32,
    ) - 128.0
    img += rng.normal(0, 4, (h, w, 3))
    return img


# one distinctive base color per class id (class 0 = background)
_CLASS_COLORS = np.array(
    [
        [90, 110, 90],    # 0 background (greenish gray)
        [200, 40, 40],    # 1 red
        [40, 60, 200],    # 2 blue
        [230, 200, 40],   # 3 yellow
        [40, 180, 170],   # 4 teal
        [170, 60, 190],   # 5 purple
        [240, 130, 30],   # 6 orange
        [110, 220, 60],   # 7 lime
        [150, 90, 40],    # 8 brown
        [240, 120, 180],  # 9 pink
        [60, 60, 60],     # 10 dark gray
    ],
    np.float32,
)


def _draw_shape(rng, img, label, cls, h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = rng.uniform(0.2, 0.8) * h, rng.uniform(0.2, 0.8) * w
    r = rng.uniform(0.10, 0.28) * min(h, w)
    kind = rng.integers(3)
    if kind == 0:  # circle
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    elif kind == 1:  # axis-aligned square
        mask = (np.abs(yy - cy) < r) & (np.abs(xx - cx) < r)
    else:  # triangle (half-plane intersection)
        mask = (
            (yy - cy > -r)
            & (yy - cy + 2 * (xx - cx) < r)
            & (yy - cy - 2 * (xx - cx) < r)
        )
    color = _CLASS_COLORS[cls] + rng.normal(0, 10, 3)
    img[mask] = 0.75 * color + 0.25 * img[mask] + rng.normal(0, 6, (int(mask.sum()), 3))
    label[mask] = cls
    return mask


def _voc_xml(name, h, w, objects):
    objs = "".join(
        f"<object><name>{cls}</name><difficult>{int(diff)}</difficult>"
        f"<bndbox><xmin>{x0}</xmin><ymin>{y0}</ymin>"
        f"<xmax>{x1}</xmax><ymax>{y1}</ymax></bndbox></object>"
        for cls, (x0, y0, x1, y1), diff in objects
    )
    return (
        f"<annotation><filename>{name}.jpg</filename>"
        f"<size><width>{w}</width><height>{h}</height>"
        f"<depth>3</depth></size>{objs}</annotation>"
    )


def make_voc(root, n_train, n_val, num_classes, size, rng):
    img_dir = os.path.join(root, "JPEGImages")
    ann_dir = os.path.join(root, "SegmentationClass")
    xml_dir = os.path.join(root, "Annotations")
    set_dir = os.path.join(root, "ImageSets", "Segmentation")
    det_set_dir = os.path.join(root, "ImageSets", "Main")
    for d in (img_dir, ann_dir, xml_dir, set_dir, det_set_dir):
        os.makedirs(d, exist_ok=True)
    names = {"train": [], "val": []}
    for split, n in (("train", n_train), ("val", n_val)):
        for i in range(n):
            name = f"{split}_{i:04d}"
            h = w = size
            img = _texture(rng, h, w, _CLASS_COLORS[0])
            label = np.zeros((h, w), np.uint8)
            objects = []
            for _ in range(int(rng.integers(1, 4))):
                cls = int(rng.integers(1, num_classes))
                mask = _draw_shape(rng, img, label, cls, h, w)
                ys, xs = np.where(mask)
                if len(ys) == 0:
                    continue
                # every drawn shape gets a box (an unannotated visible
                # object would score correct detections as false
                # positives); VOC XML coords are 1-based inclusive.
                # ~15% are flagged 'difficult' so the AP ignore-matching
                # path is exercised on synthetic data too
                objects.append(
                    (f"shape{cls}",
                     (int(xs.min()) + 1, int(ys.min()) + 1,
                      int(xs.max()) + 1, int(ys.max()) + 1),
                     bool(rng.random() < 0.15))
                )
            Image.fromarray(
                np.clip(img, 0, 255).astype(np.uint8)
            ).save(os.path.join(img_dir, name + ".jpg"), quality=92)
            Image.fromarray(label).save(os.path.join(ann_dir, name + ".png"))
            with open(os.path.join(xml_dir, name + ".xml"), "w") as f:
                f.write(_voc_xml(name, h, w, objects))
            names[split].append(name)
        with open(os.path.join(set_dir, f"{split}.txt"), "w") as f:
            f.write("\n".join(names[split]) + "\n")
        with open(os.path.join(det_set_dir, f"{split}.txt"), "w") as f:
            f.write("\n".join(names[split]) + "\n")
    # stage-1 image lists (relative to root, reference voc_train.txt style)
    with open(os.path.join(root, "voc_train.txt"), "w") as f:
        f.write(
            "\n".join(f"JPEGImages/{n}.jpg" for n in names["train"]) + "\n"
        )
    with open(os.path.join(root, "voc_all.txt"), "w") as f:
        f.write(
            "\n".join(f"JPEGImages/{n}.jpg"
                      for n in names["train"] + names["val"]) + "\n"
        )
    # ImageFolder layout for the distillation demo (class dirs of symlinks)
    ifroot = os.path.join(os.path.dirname(root), "imagefolder")
    for i, n in enumerate(names["train"]):
        d = os.path.join(ifroot, f"class{i % 3}")
        os.makedirs(d, exist_ok=True)
        dst = os.path.join(d, n + ".jpg")
        if not os.path.exists(dst):  # absolute target: a cwd-relative
            # one resolves against the LINK dir -> dangling
            os.symlink(os.path.abspath(os.path.join(img_dir, n + ".jpg")), dst)
    return names


def make_ade(root, n_train, n_val, num_classes, size, rng):
    """ADEChallengeData2016 layout: images/{training,validation} +
    annotations/{training,validation}, labels 1..150 with 0 = ignore
    (the probe applies reduce_zero_label)."""
    for split, n in (("training", n_train), ("validation", n_val)):
        img_dir = os.path.join(root, "images", split)
        ann_dir = os.path.join(root, "annotations", split)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        for i in range(n):
            name = f"ADE_{split[:5]}_{i:08d}"
            h = w = size
            img = _texture(rng, h, w, _CLASS_COLORS[0])
            label = np.zeros((h, w), np.uint8)
            for _ in range(int(rng.integers(1, 4))):
                cls = int(rng.integers(1, num_classes))
                _draw_shape(rng, img, label, cls, h, w)
            Image.fromarray(
                np.clip(img, 0, 255).astype(np.uint8)
            ).save(os.path.join(img_dir, name + ".jpg"), quality=92)
            # ADE annotation convention: class ids are 1-based, 0 = ignore
            Image.fromarray(label + 1).save(
                os.path.join(ann_dir, name + ".png"))


def make_nyu(root, n_train, n_val, rng):
    h, w = 480, 640
    for sub in ("rgb", "depth"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    lines = {"train": [], "val": []}
    for split, n in (("train", n_train), ("val", n_val)):
        for i in range(n):
            name = f"{split}_{i:04d}"
            img = _texture(rng, h, w, _CLASS_COLORS[0])
            label = np.zeros((h, w), np.uint8)
            # depth: slanted plane 1.5-6 m + shape offsets
            yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
            a, b = rng.uniform(-1, 1, 2)
            depth = 3.5 + 1.5 * (a * (yy / h - 0.5) + b * (xx / w - 0.5))
            for _ in range(int(rng.integers(1, 4))):
                cls = int(rng.integers(1, len(_CLASS_COLORS)))
                mask = _draw_shape(rng, img, label, cls, h, w)
                depth[mask] -= rng.uniform(0.4, 1.8)
            depth = np.clip(depth, 0.8, 9.9)
            rgb_p = f"rgb/{name}.jpg"
            dep_p = f"depth/{name}.png"
            Image.fromarray(
                np.clip(img, 0, 255).astype(np.uint8)
            ).save(os.path.join(root, rgb_p), quality=92)
            Image.fromarray(
                (depth * 1000).astype(np.uint16)
            ).save(os.path.join(root, dep_p))
            lines[split].append(f"{rgb_p} {dep_p} 518.85")
        fname = "nyu_train.txt" if split == "train" else "nyu_test.txt"
        with open(os.path.join(root, fname), "w") as f:
            f.write("\n".join(lines[split]) + "\n")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/dvt_synth")
    p.add_argument("--n_train", type=int, default=24)
    p.add_argument("--n_val", type=int, default=8)
    p.add_argument("--num_classes", type=int, default=8)
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    rng = np.random.default_rng(args.seed)
    make_voc(os.path.join(args.out, "voc"), args.n_train, args.n_val,
             args.num_classes, args.size, rng)
    make_ade(os.path.join(args.out, "ade"), args.n_train, args.n_val,
             args.num_classes, args.size, rng)
    make_nyu(os.path.join(args.out, "nyu"), args.n_train, args.n_val, rng)
    print(f"synthetic VOC+ADE+NYU written under {args.out}")


if __name__ == "__main__":
    main()
