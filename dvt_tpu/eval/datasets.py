"""Dense-task evaluation datasets: VOC2012 / ADE20k segmentation, NYU depth.

Host-side numpy rebuild of the mmseg/depth dataset+pipeline stack the
reference forks (evaluation/configs/*: LoadImageFromFile, LoadAnnotations,
Resize img_scale=(2048,512) ratio 0.5-2.0, RandomCrop 512 cat_max_ratio
0.75, RandomFlip, PhotoMetricDistortion, Normalize, Pad; NYU: depth png/1000,
NYUCrop, RandomRotate/Flip/Crop, ColorAug).

Each dataset yields dicts of float32 images (normalized, NHWC) and labels.
File layouts follow the upstream conventions so the same data roots work.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from dvt_tpu.data.single_image import load_image

# mmseg normalization (configs use ImageNet stats on 0-255 scale)
SEG_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SEG_STD = np.array([58.395, 57.12, 57.375], np.float32)

VOC_CLASSES = 21
ADE_CLASSES = 150


def _load_label(path: str) -> np.ndarray:
    """Load an annotation png in its native dtype (uint8 class maps,
    uint16 depth maps)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im)


def _bilinear_resize_u8(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    im = Image.fromarray(img)
    return np.asarray(im.resize((size[1], size[0]), Image.BILINEAR))


def _nearest_resize_u8(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    im = Image.fromarray(img)
    return np.asarray(im.resize((size[1], size[0]), Image.NEAREST))


def _rgb_to_hsv(img01: np.ndarray):
    """(H, W, 3) RGB in [0,1] -> (h deg/2 in [0,180), s in [0,1], v in
    [0,1]) - the cv2 convention mmseg's hue shift is written against."""
    r, g, b = img01[..., 0], img01[..., 1], img01[..., 2]
    maxc = img01.max(-1)
    minc = img01.min(-1)
    v = maxc
    diff = maxc - minc
    s = np.where(maxc > 0, diff / np.maximum(maxc, 1e-12), 0.0)
    safe = np.maximum(diff, 1e-12)
    h = np.where(
        maxc == r, (g - b) / safe % 6.0,
        np.where(maxc == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    )
    h = np.where(diff == 0, 0.0, h) * 30.0  # 60 deg / 2
    return h, s, v


def _hsv_to_rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray) -> np.ndarray:
    h6 = (h / 30.0) % 6.0
    i = np.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(np.int32) % 6
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    return np.stack([r, g, b], -1)


def photometric_distortion(img: np.ndarray, rng: np.random.Generator,
                           brightness_delta: float = 32,
                           contrast_range=(0.5, 1.5),
                           saturation_range=(0.5, 1.5),
                           hue_delta: int = 18) -> np.ndarray:
    """mmseg PhotoMetricDistortion on a float32 0-255 RGB image:
    brightness (p=.5) -> [contrast if mode] -> saturation (p=.5, HSV S
    scale) -> hue (p=.5, +-hue_delta on the 0-180 cv2 H axis) ->
    [contrast if not mode], each an independent coin flip
    (mmseg/datasets/pipelines/transforms.py PhotoMetricDistortion)."""
    img = img.astype(np.float32)
    if rng.integers(2):
        img = img + rng.uniform(-brightness_delta, brightness_delta)
    contrast_first = rng.integers(2)
    if contrast_first and rng.integers(2):
        img = img * rng.uniform(*contrast_range)
    do_sat = rng.integers(2)
    do_hue = rng.integers(2)
    if do_sat or do_hue:
        h, s, v = _rgb_to_hsv(np.clip(img, 0, 255) / 255.0)
        if do_sat:
            s = np.clip(s * rng.uniform(*saturation_range), 0.0, 1.0)
        if do_hue:
            h = (h + rng.integers(-hue_delta, hue_delta)) % 180.0
        img = _hsv_to_rgb(h, s, v) * 255.0
    if not contrast_first and rng.integers(2):
        img = img * rng.uniform(*contrast_range)
    return np.clip(img, 0, 255)


@dataclasses.dataclass
class SegTrainPipeline:
    """Resize(ratio 0.5-2.0 of (2048, 512)) -> RandomCrop(512, cat_max 0.75)
    -> RandomFlip -> PhotoMetricDistortion -> Normalize -> Pad."""

    crop_size: Tuple[int, int] = (512, 512)
    img_scale: Tuple[int, int] = (2048, 512)
    ratio_range: Tuple[float, float] = (0.5, 2.0)
    cat_max_ratio: float = 0.75
    ignore_index: int = 255
    seed: int = 0

    def __post_init__(self):
        self.rng = np.random.default_rng(self.seed)

    def __call__(self, img: np.ndarray, label: np.ndarray):
        h, w = img.shape[:2]
        # keep-ratio resize to img_scale * random ratio
        ratio = self.rng.uniform(*self.ratio_range)
        max_long, max_short = self.img_scale
        scale = min(max_long * ratio / max(h, w), max_short * ratio / min(h, w))
        nh, nw = max(int(h * scale + 0.5), 1), max(int(w * scale + 0.5), 1)
        img = _bilinear_resize_u8(img, (nh, nw))
        label = _nearest_resize_u8(label, (nh, nw))

        ch, cw = self.crop_size
        # random crop w/ cat_max_ratio retries (10 attempts like mmseg)
        for _ in range(10):
            y0 = self.rng.integers(max(nh - ch, 0) + 1)
            x0 = self.rng.integers(max(nw - cw, 0) + 1)
            lab_crop = label[y0 : y0 + ch, x0 : x0 + cw]
            vals, counts = np.unique(lab_crop, return_counts=True)
            counts = counts[vals != self.ignore_index]
            if counts.size > 1 and counts.max() / counts.sum() < self.cat_max_ratio:
                break
        img = img[y0 : y0 + ch, x0 : x0 + cw]
        label = label[y0 : y0 + ch, x0 : x0 + cw]

        if self.rng.random() < 0.5:
            img = img[:, ::-1]
            label = label[:, ::-1]

        img = photometric_distortion(img.astype(np.float32), self.rng)
        img = (img - SEG_MEAN) / SEG_STD

        ph, pw = ch - img.shape[0], cw - img.shape[1]
        if ph > 0 or pw > 0:
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
            label = np.pad(label, ((0, ph), (0, pw)),
                           constant_values=self.ignore_index)
        return np.ascontiguousarray(img, np.float32), np.ascontiguousarray(label)


class SegDataset:
    """VOC2012 / ADE20k layout; split file or directory scan."""

    def __init__(self, data_root: str, img_dir: str, ann_dir: str,
                 split: Optional[str] = None, img_suffix: str = ".jpg",
                 seg_suffix: str = ".png", train: bool = True,
                 reduce_zero_label: bool = False,
                 crop_size: Tuple[int, int] = (512, 512), seed: int = 0):
        self.data_root = data_root
        self.img_dir = os.path.join(data_root, img_dir)
        self.ann_dir = os.path.join(data_root, ann_dir)
        self.img_suffix = img_suffix
        self.seg_suffix = seg_suffix
        self.reduce_zero_label = reduce_zero_label  # ADE: label-1, 0->255
        self.train = train
        self.pipeline = SegTrainPipeline(crop_size=crop_size, seed=seed)
        if split:
            with open(os.path.join(data_root, split)) as f:
                self.names = [ln.strip() for ln in f if ln.strip()]
        else:
            self.names = sorted(
                os.path.splitext(f)[0]
                for f in os.listdir(self.img_dir)
                if f.endswith(img_suffix)
            )

    def __len__(self):
        return len(self.names)

    def _label(self, name: str) -> np.ndarray:
        lab = _load_label(os.path.join(self.ann_dir, name + self.seg_suffix))
        if lab.ndim == 3:
            lab = lab[..., 0]
        if self.reduce_zero_label:
            lab = lab.astype(np.int16) - 1
            lab[lab < 0] = 255
            lab = lab.astype(np.uint8)
        return lab

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        name = self.names[index]
        img = load_image(os.path.join(self.img_dir, name + self.img_suffix))
        label = self._label(name)
        if self.train:
            img, label = self.pipeline(img, label)
            return {"image": img, "label": label.astype(np.int32)}
        # eval: keep-ratio resize to (2048, 512) like MultiScaleFlipAug
        h, w = img.shape[:2]
        scale = min(2048 / max(h, w), 512 / min(h, w))
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        img_r = _bilinear_resize_u8(img, (nh, nw)).astype(np.float32)
        img_r = (img_r - SEG_MEAN) / SEG_STD
        return {
            "image": img_r.astype(np.float32),
            "label": label.astype(np.int32),
            "orig_shape": np.array([h, w]),
        }


class NYUDepthDataset:
    """NYU-Depth-v2 layout (datasets/nyu.py): split file lines
    'rgb_path depth_path focal'; depth png / 1000 -> meters; train crop to
    depth-valid region (NYUCrop) + flip + color aug; eval returns full-res
    image + gt with the eigen crop applied at metric time."""

    def __init__(self, data_root: str, split: str, train: bool = True,
                 crop_size: Tuple[int, int] = (416, 544),
                 depth_scale: float = 1000.0, seed: int = 0):
        self.data_root = data_root
        self.train = train
        self.crop_size = crop_size
        self.depth_scale = depth_scale
        self.rng = np.random.default_rng(seed)
        self.items: List[Tuple[str, Optional[str]]] = []
        with open(os.path.join(data_root, split)) as f:
            for ln in f:
                parts = ln.strip().split()
                if not parts:
                    continue
                img_p = parts[0]
                dep_p = parts[1] if len(parts) > 1 and parts[1] != "None" else None
                if train and dep_p is None:
                    # a depth-less line is unusable as a train target;
                    # skip at init instead of TypeError-ing mid-epoch
                    continue
                self.items.append((img_p, dep_p))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        img_p, dep_p = self.items[index]
        img = load_image(os.path.join(self.data_root, img_p)).astype(np.float32)
        depth = None
        if dep_p is not None:
            depth = _load_label(os.path.join(self.data_root, dep_p))
            depth = depth.astype(np.float32) / self.depth_scale
        if not self.train:
            im = (img - SEG_MEAN) / SEG_STD
            out = {"image": im.astype(np.float32)}
            if depth is not None:
                out["depth"] = depth
            return out

        # NYUCrop: fixed valid-depth region (pipelines/transforms.py NYUCrop)
        img = img[45:472, 43:608]
        depth = depth[45:472, 43:608]
        # RandomRotate(prob 0.5, +-2.5 deg, pad 0) - NYU train recipe
        # (vitb_nyu_linear_config.py:11, transforms.py RandomRotate)
        if self.rng.random() < 0.5:
            from PIL import Image as _PILImage

            angle = float(self.rng.uniform(-2.5, 2.5))
            img = np.asarray(
                _PILImage.fromarray(img.astype(np.uint8)).rotate(
                    angle, resample=_PILImage.BILINEAR, fillcolor=0
                ),
                np.float32,
            )
            depth = np.asarray(
                _PILImage.fromarray(depth).rotate(
                    angle, resample=_PILImage.BILINEAR, fillcolor=0
                ),
                np.float32,
            )
        # RandomFlip -> RandomCrop (reference pipeline order, config :11-13)
        if self.rng.random() < 0.5:
            img = img[:, ::-1]
            depth = depth[:, ::-1]
        ch, cw = self.crop_size
        h, w = img.shape[:2]
        y0 = self.rng.integers(max(h - ch, 0) + 1)
        x0 = self.rng.integers(max(w - cw, 0) + 1)
        img = img[y0 : y0 + ch, x0 : x0 + cw]
        depth = depth[y0 : y0 + ch, x0 : x0 + cw]
        # ColorAug fires with prob=0.5 (transforms.py ColorAug + config
        # pipeline prob; unconditional application trained on a shifted
        # distribution)
        if self.rng.random() < 0.5:
            gamma = self.rng.uniform(0.9, 1.1)
            bright = self.rng.uniform(0.75, 1.25)
            colors = self.rng.uniform(0.9, 1.1, 3)
            img = np.clip(
                (img / 255.0) ** gamma * bright * colors * 255.0, 0, 255)
        img = (img - SEG_MEAN) / SEG_STD
        return {
            "image": np.ascontiguousarray(img, np.float32),
            "depth": np.ascontiguousarray(depth, np.float32),
        }


class SegFeatureDataset:
    """Cached-feature segmentation dataset: stage-1 ``.npy`` feature maps as
    the 'images'.

    The reference evaluates cached features directly through
    PascalVOCFeatureDataset (img_suffix='.npy',
    evaluation/segmentation/datasets/dataset_feature_wrapper.py:9-68) +
    LoadFeaturesFromFile (pipelines/loading.py:10-99). Here: ``feat_dir``
    is a directory of per-image feature files in the stage-1 dump layout
    (e.g. <save_root>/denoised_features/<model>/), labels come from the
    ordinary VOC/ADE annotation dir, and the linear probe trains on the
    feature maps with an identity backbone.
    """

    def __init__(self, feat_dir: str, data_root: str, ann_dir: str,
                 split: Optional[str] = None, seg_suffix: str = ".png",
                 reduce_zero_label: bool = False,
                 label_size: Optional[Tuple[int, int]] = None):
        self.feat_dir = feat_dir
        self.ann_dir = os.path.join(data_root, ann_dir)
        self.seg_suffix = seg_suffix
        self.reduce_zero_label = reduce_zero_label
        # train mode: nearest-resize labels to a common shape so feature
        # batches collate (features already share the stage-1 grid shape)
        self.label_size = label_size
        if split:
            with open(os.path.join(data_root, split)) as f:
                names = [ln.strip() for ln in f if ln.strip()]
        else:
            names = sorted(
                os.path.splitext(os.path.relpath(p, feat_dir))[0]
                for p in glob.glob(os.path.join(feat_dir, "**/*.npy"),
                                   recursive=True)
            )
        # keep only names whose feature dump exists (stage 1 may have been
        # run on a subset; the reference silently falls back to a fixed
        # file, loading.py:55-62 - we drop instead) AND whose label exists
        # under THIS annotation dir: splitless layouts (ADE) glob ONE
        # feature_root for both train and val datasets, and label-dir
        # membership is what separates the two splits (without it the val
        # set silently equalled the train set and crashed at label load)
        self.names = [
            n for n in names
            if os.path.isfile(os.path.join(feat_dir, n + ".npy"))
            and os.path.isfile(self._label_path(n))
        ]

    def _label_path(self, name: str) -> str:
        # labels are keyed by BASENAME: ADE feature dumps carry the
        # images/<split>/ prefix while labels live in annotations/<split>/
        return os.path.join(
            self.ann_dir, os.path.basename(name) + self.seg_suffix)

    def __len__(self):
        return len(self.names)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        name = self.names[index]
        feat = np.load(os.path.join(self.feat_dir, name + ".npy"))
        feat = np.asarray(feat, np.float32)
        feat = feat.reshape(feat.shape[-3], feat.shape[-2], feat.shape[-1])
        lab = _load_label(self._label_path(name))
        if lab.ndim == 3:
            lab = lab[..., 0]
        if self.reduce_zero_label:
            lab = lab.astype(np.int16) - 1
            lab[lab < 0] = 255
            lab = lab.astype(np.uint8)
        if self.label_size is not None and lab.shape != tuple(self.label_size):
            lab = _nearest_resize_u8(lab, tuple(self.label_size))
        return {"feature": feat, "label": lab.astype(np.int32)}


class CustomDepthDataset:
    """Directory-layout depth dataset (reference
    evaluation/depth/datasets/custom.py:24-120): ``data_root/rgb/*`` images
    paired positionally with ``data_root/depth/*`` maps (sorted order);
    test mode lists images only. Depth pngs are divided by ``depth_scale``.
    No eigen crop - metrics use the full (min_depth, max_depth) mask."""

    def __init__(self, data_root: str, train: bool = False,
                 crop_size: Tuple[int, int] = (416, 544),
                 depth_scale: float = 1.0, min_depth: float = 1e-3,
                 max_depth: float = 10.0, seed: int = 0):
        self.data_root = data_root
        self.train = train
        self.crop_size = crop_size
        self.depth_scale = depth_scale
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.rng = np.random.default_rng(seed)
        imgs = sorted(os.listdir(os.path.join(data_root, "rgb")))
        depth_dir = os.path.join(data_root, "depth")
        depths = (sorted(os.listdir(depth_dir))
                  if os.path.isdir(depth_dir) else [])
        if train:
            self.items = list(zip(imgs, depths))
        else:
            # pair by stem (rgb/0001.jpg <-> depth/0001.png), falling back
            # to positional like the reference's sorted-zip (custom.py):
            # exact-name matching silently found no GT when extensions
            # differed and metrics ran over zero images
            by_stem = {os.path.splitext(d)[0]: d for d in depths}
            if len(depths) == len(imgs):
                self.items = [
                    (im, by_stem.get(os.path.splitext(im)[0], d))
                    for im, d in zip(imgs, depths)
                ]
            else:
                self.items = [
                    (im, by_stem.get(os.path.splitext(im)[0]))
                    for im in imgs
                ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        img_n, dep_n = self.items[index]
        img = load_image(
            os.path.join(self.data_root, "rgb", img_n)
        ).astype(np.float32)
        depth = None
        if dep_n is not None:
            depth = _load_label(os.path.join(self.data_root, "depth", dep_n))
            depth = depth.astype(np.float32) / self.depth_scale
        if not self.train:
            out = {"image": ((img - SEG_MEAN) / SEG_STD).astype(np.float32)}
            if depth is not None:
                out["depth"] = depth
            return out
        ch, cw = self.crop_size
        h, w = img.shape[:2]
        y0 = self.rng.integers(max(h - ch, 0) + 1)
        x0 = self.rng.integers(max(w - cw, 0) + 1)
        img = img[y0:y0 + ch, x0:x0 + cw]
        depth = depth[y0:y0 + ch, x0:x0 + cw]
        if self.rng.random() < 0.5:
            img = img[:, ::-1]
            depth = depth[:, ::-1]
        img = (img - SEG_MEAN) / SEG_STD
        return {
            "image": np.ascontiguousarray(img, np.float32),
            "depth": np.ascontiguousarray(depth, np.float32),
        }


class VOCDetectionDataset:
    """VOC2012 detection layout: JPEGImages/ + Annotations/*.xml +
    ImageSets/Main/<split>.txt.

    Counterpart of the mmdet VOC dataset the reference's ViTDet config
    trains on (evaluation/configs/vitb_voc2012_vitdet_config.py:78-115 -
    unrunnable as shipped upstream, its mmdet base config is absent).
    Images are square-resized to ``image_size`` (the FasterRCNNProbe's
    static input), boxes scaled along; train adds hflip. ``classes=None``
    scans the annotations and uses the sorted name set, so the same code
    serves real VOC (20 canonical names) and synthetic layouts.
    """

    def __init__(self, data_root: str, split: str = "train",
                 image_size: int = 512, train: bool = True,
                 classes: Optional[Tuple[str, ...]] = None,
                 max_boxes: int = 8, seed: int = 0):
        import xml.etree.ElementTree as ET

        import itertools

        self.data_root = data_root
        self.image_size = image_size
        self.train = train
        self.max_boxes = max_boxes
        self.seed = seed
        # per-call RNG derived from (seed, index, draw#): __getitem__ runs
        # concurrently in DataLoader worker threads and a shared Generator
        # is not thread-safe; itertools.count().__next__ is atomic
        self._draw = itertools.count()
        split_f = os.path.join(data_root, "ImageSets", "Main",
                               split + ".txt")
        with open(split_f) as f:
            self.names = [ln.strip() for ln in f if ln.strip()]
        self._ann = {}
        found = set()
        for n in self.names:
            tree = ET.parse(os.path.join(data_root, "Annotations",
                                         n + ".xml"))
            objs = []
            for obj in tree.findall("object"):
                cls = obj.findtext("name")
                # VOC protocol: 'difficult' objects are excluded from the
                # training targets and IGNORE-matched at AP time (a
                # detection matching one is neither TP nor FP) — keep them
                # with a flag; voc_ap50 consumes the mask. Non-difficult
                # objects sort first so they never lose max_boxes slots.
                difficult = obj.findtext("difficult", "0").strip() == "1"
                bb = obj.find("bndbox")
                box = [float(bb.findtext(k))
                       for k in ("xmin", "ymin", "xmax", "ymax")]
                # VOC pixel coordinates are 1-based inclusive; convert to
                # 0-based half-open (x0 = xmin-1, x1 = xmax), so width =
                # xmax - xmin + 1 pixels as the protocol defines
                box = [box[0] - 1, box[1] - 1, box[2], box[3]]
                objs.append((cls, box, difficult))
                # difficult objects COUNT toward the class set: a class
                # seen only as difficult must still be in _cls_index so
                # its GT enters the AP ignore set (a detection on it is
                # neither TP nor FP) instead of scoring as FP
                found.add(cls)
            objs.sort(key=lambda o: o[2])
            size = tree.find("size")
            wh = (float(size.findtext("width")),
                  float(size.findtext("height")))
            self._ann[n] = (objs, wh)
        self.classes = tuple(classes) if classes else tuple(sorted(found))
        self._cls_index = {c: i for i, c in enumerate(self.classes)}

    @property
    def num_classes(self) -> int:
        return len(self.classes)

    def __len__(self):
        return len(self.names)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        name = self.names[index]
        objs, (w0, h0) = self._ann[name]
        img = load_image(
            os.path.join(self.data_root, "JPEGImages", name + ".jpg"))
        s = self.image_size
        # reference pipeline: Resize keep_ratio to fit (s, s) + Normalize +
        # Pad (mmdet pads with 0 AFTER normalize), boxes scaled by the one
        # uniform factor — not an aspect-distorting square resize
        # (vitb_voc2012_vitdet_config.py:12-16). Padding bottom/right keeps
        # box coordinates unchanged and the canvas shape static for jit.
        scale = min(s / w0, s / h0)
        nh, nw = max(round(h0 * scale), 1), max(round(w0 * scale), 1)
        img = _bilinear_resize_u8(img, (nh, nw)).astype(np.float32)
        boxes = np.zeros((self.max_boxes, 4), np.float32)
        labels = np.zeros((self.max_boxes,), np.int32)
        valid = np.zeros((self.max_boxes,), bool)
        difficult = np.zeros((self.max_boxes,), bool)
        for k, (cls, (x0, y0, x1, y1), diff) in enumerate(
                objs[: self.max_boxes]):
            if cls not in self._cls_index:
                continue
            boxes[k] = (x0 * scale, y0 * scale, x1 * scale, y1 * scale)
            labels[k] = self._cls_index[cls]
            valid[k] = not diff  # train targets exclude difficult objects
            difficult[k] = diff
        rng = np.random.default_rng((self.seed, index, next(self._draw)))
        if self.train and rng.random() < 0.5:
            img = img[:, ::-1]
            ann = valid | difficult
            x0 = boxes[:, 0].copy()
            boxes[:, 0] = np.where(ann, nw - boxes[:, 2], 0)
            boxes[:, 2] = np.where(ann, nw - x0, 0)
        img = (img - SEG_MEAN) / SEG_STD
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = img
        item = {
            "image": np.ascontiguousarray(canvas, np.float32),
            "boxes": boxes,
            "labels": labels,
            "valid": valid,
            "difficult": difficult,
        }
        if not self.train:
            # Full un-truncated GT for AP scoring: the max_boxes cap only
            # exists for shape-static jit TRAIN targets; eval runs on host.
            # Truncating here would drop difficult boxes (they sort last)
            # from the ignore set, turning correct detections on them into
            # false positives (VOC images routinely exceed max_boxes).
            eb, ec, ed = [], [], []
            for cls, (x0, y0, x1, y1), diff in objs:
                if cls not in self._cls_index:
                    continue
                eb.append((x0 * scale, y0 * scale,
                           x1 * scale, y1 * scale))
                ec.append(self._cls_index[cls])
                ed.append(diff)
            item["eval_boxes"] = np.asarray(eb, np.float32).reshape(-1, 4)
            item["eval_classes"] = np.asarray(ec, np.int32)
            item["eval_difficult"] = np.asarray(ed, bool)
        return item
