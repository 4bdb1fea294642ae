"""Cityscapes depth dataset tests (synthetic tree)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from dvt_tpu.eval.cityscapes import (
    CityscapesDepthDataset,
    garg_crop_mask,
    kb_crop,
)


def make_tree(tmp_path, rng):
    os.makedirs(tmp_path / "img")
    os.makedirs(tmp_path / "disp")
    rows = []
    for i in range(2):
        Image.fromarray(
            (rng.random((1024, 2048, 3)) * 255).astype(np.uint8)
        ).save(tmp_path / "img" / f"{i}.png")
        disp = rng.integers(256, 20000, (1024, 2048)).astype(np.uint16)
        disp[:5] = 0  # invalid band
        Image.fromarray(disp).save(tmp_path / "disp" / f"{i}.png")
        cam = {"extrinsic": {"baseline": 0.22},
               "intrinsic": {"fx": 2262.52}}
        with open(tmp_path / f"cam{i}.json", "w") as f:
            json.dump(cam, f)
        rows.append(f"img/{i}.png disp/{i}.png cam{i}.json")
    (tmp_path / "split.txt").write_text("\n".join(rows))


def test_crops():
    assert kb_crop(np.zeros((1024, 2048))).shape == (352, 1216)
    m = garg_crop_mask((352, 1216))
    assert m.any() and not m[0, 0]


def test_train_and_eval_items(tmp_path, rng):
    make_tree(tmp_path, rng)
    ds = CityscapesDepthDataset(str(tmp_path), "split.txt", train=True)
    item = ds[0]
    assert item["image"].shape == (352, 704, 3)
    assert item["depth"].shape == (352, 704)
    assert (item["depth"] >= 0).all()

    ev = CityscapesDepthDataset(str(tmp_path), "split.txt", train=False)
    item = ev[0]
    assert item["image"].shape == (352, 1216, 3)
    # invalid disparity -> zero depth, valid -> baseline*fx/disparity
    d = item["depth"]
    assert (d >= 0).all()
    max_depth = 0.22 * 2262.52 / ((256 - 1) / 256)
    assert d.max() <= max_depth * 1.01
