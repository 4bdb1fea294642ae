"""Stage-3 dataset: ImageFolder-style tree walk + resize + random hflip.

Rebuilds the torchvision ImageFolder usage in main_distillation.py:161-171
without torchvision: class-per-subdir layout (labels unused by distillation),
bicubic resize to the input size, random horizontal flip, normalization.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from dvt_tpu.data.single_image import load_image, resize_image

_IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm", ".tif", ".tiff"}


class ImageFolderDataset:
    def __init__(
        self,
        root: str,
        input_size: Tuple[int, int] = (518, 518),
        mean=(0.485, 0.456, 0.406),
        std=(0.229, 0.224, 0.225),
        random_flip: bool = True,
        seed: int = 0,
    ):
        self.root = root
        self.input_size = tuple(input_size)
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.random_flip = random_flip
        self._seed = seed
        # per-call RNGs: __getitem__ runs concurrently in DataLoader
        # threads and a shared np Generator is not thread-safe
        import itertools
        self._draw = itertools.count()

        self.samples: List[Tuple[str, int]] = []
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        if classes:
            for c in classes:
                cdir = os.path.join(root, c)
                # sort subdirectories too (torchvision sorts the whole
                # walk): dentry-order walks give different sample orders
                # on different hosts, breaking the i::num_replicas
                # striping partition in multi-host DP
                for dirpath, dirnames, files in os.walk(cdir):
                    dirnames.sort()
                    for f in sorted(files):
                        if os.path.splitext(f)[1].lower() in _IMG_EXTS:
                            self.samples.append(
                                (os.path.join(dirpath, f), self.class_to_idx[c])
                            )
        else:  # flat directory of images
            for f in sorted(os.listdir(root)):
                if os.path.splitext(f)[1].lower() in _IMG_EXTS:
                    self.samples.append((os.path.join(root, f), 0))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        path, label = self.samples[index]
        from dvt_tpu.data.native import load_image_native

        img = load_image_native(path, self.input_size, self.mean, self.std)
        if img is None:
            raw = load_image(path)
            raw = resize_image(raw, self.input_size).astype(np.float32) / 255.0
            img = (raw - self.mean) / self.std
        rng = np.random.default_rng((self._seed, index, next(self._draw)))
        if self.random_flip and rng.random() < 0.5:
            img = img[:, ::-1]
        return {"image": np.ascontiguousarray(img), "label": label}
