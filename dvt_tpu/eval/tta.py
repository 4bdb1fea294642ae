"""Test-time augmentation and inference-mode helpers for dense eval.

Rebuilds the mmseg/mmdepth inference conventions the reference forks:
  * ``inference_with_tta``: softmax probabilities averaged over (optionally)
    horizontally flipped passes, flipped back before averaging
    (segmentation/models/segmentors/encoder_decoder.py:229-261 and
    MultiScaleFlipAug, depth/datasets/pipelines/test_time_aug.py).
  * depth variant averages predicted depth maps directly
    (depth/models/depther/encoder_decoder.py:146-259).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def softmax_np(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def seg_inference_with_tta(
    logits_fn: Callable[[np.ndarray], np.ndarray],
    image: np.ndarray,
    flip: bool = False,
) -> np.ndarray:
    """(H, W, 3) -> (H, W, K) class probabilities, flip-averaged."""
    probs = softmax_np(np.asarray(logits_fn(image)))
    if flip:
        flipped = np.asarray(logits_fn(image[:, ::-1]))
        probs = probs + softmax_np(flipped)[:, ::-1]
        probs /= 2.0
    return probs


def depth_inference_with_tta(
    depth_fn: Callable[[np.ndarray], np.ndarray],
    image: np.ndarray,
    flip: bool = False,
) -> np.ndarray:
    """(H, W, 3) -> (H, W) depth, flip-averaged."""
    pred = np.asarray(depth_fn(image))
    if flip:
        pred = (pred + np.asarray(depth_fn(image[:, ::-1]))[:, ::-1]) / 2.0
    return pred


class ConcatDataset:
    """Concatenation of datasets (depth/datasets/builder.py ConcatDataset)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, index: int):
        d = int(np.searchsorted(self._offsets, index, side="right") - 1)
        return self.datasets[d][index - int(self._offsets[d])]


class RepeatDataset:
    """Repeat a dataset N times (epoch-lengthening wrapper)."""

    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times

    def __len__(self) -> int:
        return len(self.dataset) * self.times

    def __getitem__(self, index: int):
        return self.dataset[index % len(self.dataset)]
