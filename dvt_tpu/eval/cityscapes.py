"""Cityscapes depth dataset (disparity-based) + garg/KB eval crops.

Rebuild of evaluation/depth/datasets/cityscapes.py: split file lines pair
leftImg8bit png with a disparity png and a camera json; depth =
baseline * fx / disparity with disparity = (png - 1) / 256 and invalid
(<= 0) pixels zeroed (:236-253). Eval crops follow Adabins: KB crop to
352 x 1216 (:257-262) and the garg crop mask applied at metric time.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from dvt_tpu.data.single_image import load_image
from dvt_tpu.eval.datasets import SEG_MEAN, SEG_STD


def garg_crop_mask(shape: Tuple[int, int]) -> np.ndarray:
    """Adabins garg crop: rows 40.8%-99.1%, cols 3.5%-96.4% of the image."""
    h, w = shape
    m = np.zeros(shape, bool)
    m[int(0.40810811 * h):int(0.99189189 * h),
      int(0.03594771 * w):int(0.96405229 * w)] = True
    return m


def kb_crop(img: np.ndarray) -> np.ndarray:
    """Crop to the bottom-center 352 x 1216 window (KITTI benchmark crop)."""
    h, w = img.shape[:2]
    top = h - 352
    left = (w - 1216) // 2
    return img[top : top + 352, left : left + 1216]


class CityscapesDepthDataset:
    """Split file rows: 'image_rel disparity_rel camera_rel'."""

    def __init__(self, data_root: str, split: str, train: bool = True,
                 depth_scale: float = 256.0,
                 crop_size: Tuple[int, int] = (352, 704), seed: int = 0):
        self.data_root = data_root
        self.train = train
        self.depth_scale = depth_scale
        self.crop_size = crop_size
        self.rng = np.random.default_rng(seed)
        self.items: List[Tuple[str, str, Optional[str]]] = []
        with open(os.path.join(data_root, split)) as f:
            for ln in f:
                parts = ln.strip().split()
                if len(parts) >= 2:
                    cam = parts[2] if len(parts) > 2 else None
                    self.items.append((parts[0], parts[1], cam))

    def __len__(self) -> int:
        return len(self.items)

    def _depth(self, disp_path: str, cam_path: Optional[str]) -> np.ndarray:
        from dvt_tpu.eval.datasets import _load_label

        # uint16 disparity png, native dtype preserved
        disp_png = _load_label(os.path.join(self.data_root, disp_path))
        disparity = (disp_png.astype(np.float32) - 1.0) / self.depth_scale
        invalid = disparity <= 0
        disparity[invalid] = 1.0
        if cam_path is not None:
            with open(os.path.join(self.data_root, cam_path)) as f:
                camera = json.load(f)
            scale = (camera["extrinsic"]["baseline"]
                     * camera["intrinsic"]["fx"])
        else:
            scale = 0.22 * 2262.52  # standard Cityscapes rig
        depth = scale / disparity
        depth[invalid] = 0.0
        return depth

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        img_p, disp_p, cam_p = self.items[index]
        img = load_image(os.path.join(self.data_root, img_p)).astype(np.float32)
        depth = self._depth(disp_p, cam_p)
        if not self.train:
            img = kb_crop(img)
            depth = kb_crop(depth)
            return {
                "image": ((img - SEG_MEAN) / SEG_STD).astype(np.float32),
                "depth": depth,
            }
        ch, cw = self.crop_size
        h, w = img.shape[:2]
        y0 = self.rng.integers(max(h - ch, 0) + 1)
        x0 = self.rng.integers(max(w - cw, 0) + 1)
        img = img[y0 : y0 + ch, x0 : x0 + cw]
        depth = depth[y0 : y0 + ch, x0 : x0 + cw]
        if self.rng.random() < 0.5:
            img = img[:, ::-1]
            depth = depth[:, ::-1]
        img = (img - SEG_MEAN) / SEG_STD
        return {
            "image": np.ascontiguousarray(img, np.float32),
            "depth": np.ascontiguousarray(depth, np.float32),
        }
