"""Data-pipeline tests: device-side crop rendering vs torch bicubic oracle,
coordinate-grid semantics, samplers, and datasets."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dvt_tpu.data.crops import (
    CropSampler,
    render_crops,
    view_coordinate_grids,
)
from dvt_tpu.data.samplers import DistributedInfiniteSampler, InfiniteSampler


class TestCropSampler:
    def test_boxes_in_bounds_and_scale(self):
        s = CropSampler(height=100, width=80, scale=(0.1, 0.5), seed=1)
        boxes, flips = s.sample(200)
        i, j, h, w = boxes.T
        assert (i >= 0).all() and (j >= 0).all()
        assert ((i + h) <= 100).all() and ((j + w) <= 80).all()
        areas = (h * w) / (100 * 80)
        assert areas.min() > 0.05 and areas.max() < 0.7
        assert 0.2 < flips.mean() < 0.8


class TestRenderCrops:
    @pytest.mark.parametrize("box,taps", [((5, 7, 20, 24), 4),
                                          ((0, 0, 33, 33), 6)])
    def test_matches_torch_resized_crop(self, rng, box, taps):
        base = rng.standard_normal((48, 48, 3)).astype(np.float32)
        out_hw = (32, 32)
        boxes = np.asarray([box], np.int32)
        flips = np.asarray([False])

        ours = render_crops(jnp.asarray(base), jnp.asarray(boxes),
                            jnp.asarray(flips), out_hw, taps)

        i, j, h, w = box
        crop = torch.from_numpy(base[i:i + h, j:j + w]).permute(2, 0, 1)[None]
        ref = F.interpolate(crop, size=out_hw, mode="bicubic", antialias=True)
        ref = ref[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(np.asarray(ours[0]), ref, atol=1e-4, rtol=1e-4)

    def test_flip_mirrors_pixels(self, rng):
        base = rng.standard_normal((32, 32, 3)).astype(np.float32)
        boxes = np.asarray([[4, 4, 16, 16]] * 2, np.int32)
        flips = np.asarray([False, True])
        out = np.asarray(render_crops(jnp.asarray(base), jnp.asarray(boxes),
                                      jnp.asarray(flips), (8, 8)))
        np.testing.assert_allclose(out[1], out[0][:, ::-1], atol=1e-6)


class TestCoordinateGrids:
    def test_extent_and_flip(self):
        boxes = np.asarray([[10, 20, 50, 40]], np.int32)
        flips = np.asarray([False])
        g = np.asarray(view_coordinate_grids(jnp.asarray(boxes),
                                             jnp.asarray(flips), (5, 5),
                                             (100, 100)))
        # x spans [j/W, (j+w)/W]; y spans [i/H, (i+h)/H]
        np.testing.assert_allclose(g[0, 0, 0], [0.2, 0.1], atol=1e-6)
        np.testing.assert_allclose(g[0, -1, -1], [0.6, 0.6], atol=1e-6)
        gf = np.asarray(view_coordinate_grids(jnp.asarray(boxes),
                                              jnp.asarray([True]), (5, 5),
                                              (100, 100)))
        # flip mirrors x about the crop extent, leaves y alone
        np.testing.assert_allclose(gf[0, :, :, 1], g[0, :, :, 1], atol=1e-6)
        np.testing.assert_allclose(gf[0, 0, 0, 0], 0.6, atol=1e-6)
        np.testing.assert_allclose(gf[0, 0, -1, 0], 0.2, atol=1e-6)


class TestSamplers:
    def test_infinite_loops(self):
        it = iter(InfiniteSampler(3))
        assert [next(it) for _ in range(7)] == [0, 1, 2, 0, 1, 2, 0]

    def test_distributed_stripes_are_disjoint_and_cover(self):
        n, world = 10, 4
        seen = set()
        for rank in range(world):
            s = DistributedInfiniteSampler(n, world, rank)
            stripe = set(np.arange(n)[rank::world].tolist())
            got = set()
            it = iter(s)
            for _ in range(len(stripe)):
                got.add(next(it))
            assert got == stripe
            seen |= got
        assert seen == set(range(n))

    def test_epoch_changes_order(self):
        s = DistributedInfiniteSampler(32, 2, 0)
        it0 = [next(iter(s)) for _ in range(1)]
        order_a = list(np.fromiter(iter(s), int, 16))
        s.set_epoch(1)
        order_b = list(np.fromiter(iter(s), int, 16))
        assert sorted(order_a) == sorted(order_b)
        assert order_a != order_b


class TestDatasets:
    def test_paired_list_resamples_missing(self, tmp_path, rng):
        import os

        data_root = tmp_path / "imgs"
        feat_root = tmp_path / "feats"
        os.makedirs(data_root)
        from PIL import Image

        names = ["a.jpg", "b.jpg"]
        for n in names:
            Image.fromarray(
                (rng.random((20, 20, 3)) * 255).astype(np.uint8)
            ).save(data_root / n)
        # only b has features
        dfd = feat_root / "denoised"
        os.makedirs(dfd)
        np.save(dfd / "b.npy", rng.random((4, 4, 8)).astype(np.float32))
        raw_dir = str(dfd).replace("denoised", "raw_features")
        # path scheme: denoised under .../denoised_features/..., raw under raw_features
        den_dir = tmp_path / "f2" / "denoised_features"
        raw_dir = tmp_path / "f2" / "raw_features"
        os.makedirs(den_dir)
        os.makedirs(raw_dir)
        np.save(den_dir / "b.npy", rng.random((4, 4, 8)).astype(np.float32))
        np.save(raw_dir / "b.npy", rng.random((4, 4, 8)).astype(np.float32))

        lst = tmp_path / "list.txt"
        lst.write_text("a.jpg\nb.jpg\n")
        from dvt_tpu.data.paired_list import PairedListDataset

        ds = PairedListDataset(
            str(data_root), str(lst), str(tmp_path / "f2" / "denoised_features"),
            input_size=(16, 16),
        )
        item = ds[0]  # a.jpg missing -> resamples to b
        assert item["image"].shape == (16, 16, 3)
        assert item["original_feats"].shape == (4, 4, 8)

    def test_imagefolder_walk(self, tmp_path, rng):
        import os
        from PIL import Image

        for cls in ["cat", "dog"]:
            os.makedirs(tmp_path / cls)
            for k in range(2):
                Image.fromarray(
                    (rng.random((12, 14, 3)) * 255).astype(np.uint8)
                ).save(tmp_path / cls / f"{k}.png")
        from dvt_tpu.data.imagefolder import ImageFolderDataset

        ds = ImageFolderDataset(str(tmp_path), input_size=(16, 16))
        assert len(ds) == 4
        item = ds[0]
        assert item["image"].shape == (16, 16, 3)
        assert set(ds.class_to_idx) == {"cat", "dog"}


class TestDataLoader:
    """Threaded prefetch loader (dvt_tpu/data/prefetch.py)."""

    def test_yields_stacked_batches(self):
        from dvt_tpu.data.prefetch import DataLoader
        from dvt_tpu.data.samplers import InfiniteSampler

        class DS:
            def __len__(self):
                return 6

            def __getitem__(self, i):
                return {"x": np.full((2, 3), i, np.float32), "y": i}

        loader = DataLoader(DS(), 4, InfiniteSampler(6), num_workers=2)
        it = iter(loader)
        b = next(it)
        assert b["x"].shape == (4, 2, 3)
        assert b["y"].tolist() == [0, 1, 2, 3]
        b2 = next(it)
        assert b2["y"].tolist() == [4, 5, 0, 1]

    def test_producer_error_propagates(self):
        """A dataset exception must surface in the consumer, not kill the
        producer thread silently (which would hang training on q.get())."""
        import pytest

        from dvt_tpu.data.prefetch import DataLoader
        from dvt_tpu.data.samplers import InfiniteSampler

        class Bad:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                if i == 2:
                    raise ValueError("corrupt sample")
                return {"x": np.zeros(2, np.float32)}

        loader = DataLoader(Bad(), 4, InfiniteSampler(4), num_workers=2)
        with pytest.raises(ValueError, match="corrupt sample"):
            next(iter(loader))
