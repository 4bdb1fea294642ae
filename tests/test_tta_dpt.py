"""TTA helpers, dataset wrappers, and the DPT depth decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvt_tpu.eval.dpt import DPTHead
from dvt_tpu.eval.tta import (
    ConcatDataset,
    RepeatDataset,
    depth_inference_with_tta,
    seg_inference_with_tta,
)


class _SquaresDataset:
    def __init__(self, vals):
        self.vals = vals

    def __len__(self):
        return len(self.vals)

    def __getitem__(self, i):
        return self.vals[i] ** 2


class TestWrappers:
    def test_concat(self):
        ds = ConcatDataset([_SquaresDataset([1, 2]), _SquaresDataset([3])])
        assert len(ds) == 3
        assert [ds[i] for i in range(3)] == [1, 4, 9]

    def test_repeat(self):
        ds = RepeatDataset(_SquaresDataset([2, 3]), times=3)
        assert len(ds) == 6
        assert ds[5] == 9


class TestTTA:
    def test_seg_flip_average_symmetric(self, rng):
        # logits_fn that is equivariant to flips -> TTA must equal single pass
        w = rng.standard_normal((3, 4)).astype(np.float32)

        def logits_fn(img):
            return img @ w

        img = rng.standard_normal((8, 8, 3)).astype(np.float32)
        single = seg_inference_with_tta(logits_fn, img, flip=False)
        avg = seg_inference_with_tta(logits_fn, img, flip=True)
        np.testing.assert_allclose(avg, single, atol=1e-6)
        assert np.allclose(avg.sum(-1), 1.0, atol=1e-5)  # probabilities

    def test_depth_flip_average(self, rng):
        def depth_fn(img):
            return img[..., 0]

        img = rng.standard_normal((6, 6, 3)).astype(np.float32)
        out = depth_inference_with_tta(depth_fn, img, flip=True)
        np.testing.assert_allclose(out, img[..., 0], atol=1e-6)


class TestDPTHead:
    def test_shapes_and_range(self, rng):
        head = DPTHead(post_process_channels=(8, 16, 24, 32), channels=16,
                       max_depth=10.0)
        feats = [
            jnp.asarray(rng.standard_normal((1, 4, 4, 12)).astype(np.float32))
            for _ in range(4)
        ]
        params = head.init(jax.random.PRNGKey(0), feats)["params"]
        depth = head.apply({"params": params}, feats)
        # reassemble: finest 16x16 -> fusions upsample x2 each of 4 -> wait:
        # fusion_3 upsamples 2x2->... final head upsamples once more
        assert depth.ndim == 3 and depth.shape[0] == 1
        d = np.asarray(depth)
        assert (d > 0).all() and (d <= 10.002).all()

    def test_odd_grid(self, rng):
        """Odd feature grids (the DEFAULT DINOv2 37x37 regime): the
        stride-2 reassemble gives ceil(h/2), whose 2x upsample overshoots
        by one - the fusion skip must be resized, not crash."""
        head = DPTHead(post_process_channels=(8, 16, 24, 32), channels=16,
                       max_depth=10.0)
        feats = [
            jnp.asarray(rng.standard_normal((1, 5, 7, 12)).astype(np.float32))
            for _ in range(4)
        ]
        params = head.init(jax.random.PRNGKey(0), feats)["params"]
        depth = head.apply({"params": params}, feats)
        assert depth.shape[0] == 1 and depth.shape[1] >= 5 * 16 - 16
