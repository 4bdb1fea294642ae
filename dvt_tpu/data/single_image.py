"""Stage-1 single-image pipeline: base image on host, views on device.

Host side replicates the reference's base transform (single_image_dataset.py:
29-38): load RGB -> resize to the working size (bicubic) -> normalize with
the backbone's statistics. The per-view random-resized-crop runs on device
(data/crops.py).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple, Union

import numpy as np

from dvt_tpu.data.crops import CropSampler


def load_image(
    path_or_array: Union[str, np.ndarray],
    float_range: float = None,
) -> np.ndarray:
    """Decode to (H, W, 3) uint8 RGB.

    Contract for float arrays: values are expected in [0, 1] and are
    scaled by 255 (a bare astype would floor every pixel to 0/1 and
    silently feed a black image downstream). Callers holding floats
    already in 0-255 scale must pass ``float_range=255.0`` explicitly —
    with ``float_range=None`` the scale is inferred from ``arr.max()``,
    which misclassifies a legitimately near-black 0-255 image."""
    if isinstance(path_or_array, np.ndarray):
        arr = path_or_array
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        elif arr.ndim == 3 and arr.shape[-1] == 1:
            # single-channel (H, W, 1) must expand too: passing it through
            # violates the (H, W, 3) contract and crashes downstream
            arr = np.repeat(arr, 3, axis=-1)
        if np.issubdtype(arr.dtype, np.floating):
            if float_range is None:
                float_range = 1.0 if arr.max() <= 1.0 else 255.0
            arr = np.clip(arr * (255.0 / float_range), 0, 255).round()
        return arr[..., :3].astype(np.uint8)
    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None
    with Image.open(path_or_array) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def resize_image(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bicubic resize to (H, W) on host via PIL (uint8 path, like the
    reference's transforms.Resize before ToTensor)."""
    from PIL import Image

    if img.shape[:2] == tuple(size):
        return img
    im = Image.fromarray(img)
    im = im.resize((size[1], size[0]), Image.BICUBIC)
    return np.asarray(im, np.uint8)


@dataclasses.dataclass
class SingleImagePipeline:
    """Produces, per image: a normalized base image + crop boxes/flips.

    The caller uploads the base once and renders views on device. Equivalent
    surface to SingleImageDataset + RandomResizedCropFlip but with the
    device/host split inverted for TPU.
    """

    size: Tuple[int, int] = (518, 518)
    num_views: int = 768
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    scale: Tuple[float, float] = (0.1, 0.5)
    horizontal_flip: bool = True
    seed: int = 0

    def __post_init__(self):
        self._sampler = CropSampler(
            height=self.size[0],
            width=self.size[1],
            scale=self.scale,
            horizontal_flip=self.horizontal_flip,
            seed=self.seed,
        )

    def normalize(self, img_u8: np.ndarray) -> np.ndarray:
        x = img_u8.astype(np.float32) / 255.0
        return (x - np.asarray(self.mean, np.float32)) / np.asarray(
            self.std, np.float32
        )

    def prepare(self, path_or_array) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (base (H, W, 3) float32 normalized, boxes (V, 4), flips (V,))."""
        base = None
        if isinstance(path_or_array, str):
            from dvt_tpu.data.native import load_image_native

            base = load_image_native(
                path_or_array, self.size,
                np.asarray(self.mean, np.float32),
                np.asarray(self.std, np.float32),
            )
        if base is None:
            img = load_image(path_or_array)
            img = resize_image(img, self.size)
            base = self.normalize(img)
        boxes, flips = self._sampler.sample(self.num_views)
        return base, boxes, flips
