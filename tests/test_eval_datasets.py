"""Eval dataset/pipeline tests with synthetic VOC/ADE/NYU trees."""

import os

import numpy as np
import pytest
from PIL import Image

from dvt_tpu.eval.datasets import (
    NYUDepthDataset,
    SegDataset,
    SegTrainPipeline,
)


def make_voc_tree(root, rng, n=3):
    img_dir = root / "JPEGImages"
    ann_dir = root / "SegmentationClass"
    split_dir = root / "ImageSets" / "Segmentation"
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    os.makedirs(split_dir)
    names = [f"img{i}" for i in range(n)]
    for name in names:
        Image.fromarray(
            (rng.random((64, 80, 3)) * 255).astype(np.uint8)
        ).save(img_dir / f"{name}.jpg")
        lab = rng.integers(0, 21, (64, 80)).astype(np.uint8)
        lab[:4] = 255  # ignore band
        Image.fromarray(lab).save(ann_dir / f"{name}.png")
    (split_dir / "train.txt").write_text("\n".join(names))
    return names


class TestSegDataset:
    def test_train_pipeline_output(self, tmp_path, rng):
        make_voc_tree(tmp_path, rng)
        ds = SegDataset(
            str(tmp_path), "JPEGImages", "SegmentationClass",
            split="ImageSets/Segmentation/train.txt",
            train=True, crop_size=(64, 64),
        )
        assert len(ds) == 3
        item = ds[0]
        assert item["image"].shape == (64, 64, 3)
        assert item["label"].shape == (64, 64)
        assert item["image"].dtype == np.float32
        valid = item["label"][item["label"] != 255]
        assert valid.size == 0 or valid.max() < 21

    def test_eval_mode_keeps_native_label(self, tmp_path, rng):
        make_voc_tree(tmp_path, rng)
        ds = SegDataset(
            str(tmp_path), "JPEGImages", "SegmentationClass",
            split="ImageSets/Segmentation/train.txt", train=False,
        )
        item = ds[0]
        assert item["label"].shape == (64, 80)
        assert tuple(item["orig_shape"]) == (64, 80)
        # keep-ratio resize: short side -> 512 (or long side capped at 2048)
        h, w = item["image"].shape[:2]
        assert min(h, w) == 512 or max(h, w) == 2048

    def test_reduce_zero_label_ade_mode(self, tmp_path, rng):
        img_dir = tmp_path / "images"
        ann_dir = tmp_path / "annotations"
        os.makedirs(img_dir)
        os.makedirs(ann_dir)
        Image.fromarray(
            (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        ).save(img_dir / "a.jpg")
        lab = np.zeros((40, 40), np.uint8)
        lab[:20] = 5  # class 5 -> 4 after reduction; 0 -> 255
        Image.fromarray(lab).save(ann_dir / "a.png")
        ds = SegDataset(
            str(tmp_path), "images", "annotations", train=False,
            reduce_zero_label=True,
        )
        item = ds[0]
        assert (item["label"][:20] == 4).all()
        assert (item["label"][20:] == 255).all()


class TestSegTrainPipeline:
    def test_cat_max_ratio_and_pad(self, rng):
        pipe = SegTrainPipeline(crop_size=(48, 48), seed=0)
        img = (rng.random((30, 30, 3)) * 255).astype(np.uint8)
        lab = rng.integers(0, 5, (30, 30)).astype(np.uint8)
        out_img, out_lab = pipe(img, lab)
        assert out_img.shape == (48, 48, 3)
        assert out_lab.shape == (48, 48)
        # padded region labeled ignore
        assert (out_lab == 255).any() or out_lab.shape == (48, 48)


class TestNYUDataset:
    def _make(self, tmp_path, rng):
        os.makedirs(tmp_path / "rgb")
        os.makedirs(tmp_path / "depth")
        rows = []
        for i in range(2):
            Image.fromarray(
                (rng.random((480, 640, 3)) * 255).astype(np.uint8)
            ).save(tmp_path / "rgb" / f"{i}.jpg")
            depth = (rng.random((480, 640)) * 5000).astype(np.uint16)
            Image.fromarray(depth).save(tmp_path / "depth" / f"{i}.png")
            rows.append(f"rgb/{i}.jpg depth/{i}.png 518.8")
        (tmp_path / "split.txt").write_text("\n".join(rows))

    def test_train_items(self, tmp_path, rng):
        self._make(tmp_path, rng)
        ds = NYUDepthDataset(str(tmp_path), "split.txt", train=True)
        item = ds[0]
        assert item["image"].shape == (416, 544, 3)
        assert item["depth"].shape == (416, 544)
        assert item["depth"].max() <= 65.6  # uint16/1000

    def test_eval_items_full_res(self, tmp_path, rng):
        self._make(tmp_path, rng)
        ds = NYUDepthDataset(str(tmp_path), "split.txt", train=False)
        item = ds[0]
        assert item["image"].shape == (480, 640, 3)
        assert item["depth"].shape == (480, 640)


def test_custom_depth_dataset(tmp_path):
    """CustomDepthDataset: rgb/ + depth/ directory pairing (custom.py:24-120)."""
    import numpy as np
    from PIL import Image

    from dvt_tpu.eval.datasets import CustomDepthDataset

    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (40, 50, 3), dtype=np.uint8).astype(np.uint8)
        ).save(tmp_path / "rgb" / f"{i}.png")
        Image.fromarray(
            rng.integers(0, 5000, (40, 50), dtype=np.int32).astype(np.int32)
        ).save(tmp_path / "depth" / f"{i}.png")

    ds = CustomDepthDataset(str(tmp_path), train=True, crop_size=(32, 32),
                            depth_scale=1000.0)
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["depth"].shape == (32, 32)
    assert item["depth"].max() <= 5.0  # scaled to meters

    ds_val = CustomDepthDataset(str(tmp_path), train=False)
    item = ds_val[1]
    assert item["image"].shape == (40, 50, 3)
    assert "depth" in item


def test_voc_detection_dataset(tmp_path):
    """XML parse, class discovery, keep-ratio resize + pad + box scaling,
    difficult-flag plumbing, hflip."""
    import numpy as np
    from PIL import Image

    from dvt_tpu.eval.datasets import VOCDetectionDataset

    root = tmp_path
    (root / "JPEGImages").mkdir()
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    Image.fromarray(np.zeros((100, 200, 3), np.uint8)).save(
        root / "JPEGImages" / "a.jpg")
    (root / "Annotations" / "a.xml").write_text(
        "<annotation><size><width>200</width><height>100</height>"
        "<depth>3</depth></size>"
        "<object><name>cat</name><bndbox><xmin>21</xmin><ymin>11</ymin>"
        "<xmax>60</xmax><ymax>50</ymax></bndbox></object>"
        "<object><name>dog</name><bndbox><xmin>101</xmin><ymin>1</ymin>"
        "<xmax>200</xmax><ymax>100</ymax></bndbox></object>"
        "<object><name>cat</name><difficult>1</difficult>"
        "<bndbox><xmin>1</xmin><ymin>1</ymin>"
        "<xmax>10</xmax><ymax>10</ymax></bndbox></object>"
        "<object><name>ghost</name><difficult>1</difficult>"
        "<bndbox><xmin>1</xmin><ymin>1</ymin>"
        "<xmax>10</xmax><ymax>10</ymax></bndbox></object>"
        "</annotation>")
    (root / "ImageSets" / "Main" / "train.txt").write_text("a\n")

    ds = VOCDetectionDataset(str(root), "train", image_size=128,
                             train=False)
    # difficult objects excluded from train targets but counted toward
    # the class set: a class seen only as difficult ('ghost') needs a
    # class id so its GT enters the AP ignore set - a detection on it is
    # neither TP nor FP (VOC protocol), not a false positive
    assert ds.classes == ("cat", "dog", "ghost")
    item = ds[0]
    assert item["image"].shape == (128, 128, 3)
    # keep_ratio resize (mmdet Resize): one uniform scale
    # min(128/200, 128/100) = 0.64 on both axes, padded bottom to 128
    np.testing.assert_allclose(
        item["boxes"][0], [20 * 0.64, 10 * 0.64, 60 * 0.64, 50 * 0.64])
    # padded rows are 0 (mmdet pads after normalize)
    assert np.abs(item["image"][64:]).max() == 0
    assert item["valid"][:2].all() and not item["valid"][2:].any()
    assert not item["difficult"][:2].any() and item["difficult"][2]
    # the difficult box rides along for the eval ignore set
    np.testing.assert_allclose(
        item["boxes"][2], [0.0, 0.0, 10 * 0.64, 10 * 0.64])
    assert tuple(item["labels"][:2]) == (0, 1)

    # train-mode hflip keeps boxes inside the resized region and
    # preserves width (flip happens before padding, over nw=128)
    ds_t = VOCDetectionDataset(str(root), "train", image_size=128,
                               train=True, seed=3)
    for _ in range(6):
        it = ds_t[0]
        b = it["boxes"][it["valid"]]
        assert (b[:, 0] <= b[:, 2]).all()
        assert b.min() >= 0 and b.max() <= 128
        np.testing.assert_allclose(b[0, 2] - b[0, 0], 40 * 0.64, atol=1e-4)


def test_rgb_hsv_roundtrip(rng):
    from dvt_tpu.eval.datasets import _hsv_to_rgb, _rgb_to_hsv

    img = rng.random((17, 13, 3)).astype(np.float64)
    h, s, v = _rgb_to_hsv(img)
    assert 0 <= h.min() and h.max() < 180.0
    back = _hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(back, img, atol=1e-6)


def test_photometric_distortion_identity_seeds(rng):
    """All coins tails -> identity; and outputs stay in [0, 255]."""
    from dvt_tpu.eval.datasets import photometric_distortion

    img = (rng.random((9, 9, 3)) * 255).astype(np.float32)

    class Zeros:
        def integers(self, *a, **k):
            return 0

        def uniform(self, lo, hi, *a):
            return lo

    out = photometric_distortion(img, Zeros())
    np.testing.assert_allclose(out, img, atol=1e-4)
    out2 = photometric_distortion(img, np.random.default_rng(3))
    assert out2.min() >= 0 and out2.max() <= 255
