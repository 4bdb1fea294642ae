"""Evaluation-harness tests: probes learn, inference helpers and metrics
match the reference formulas (torch/numpy oracles where practical)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvt_tpu.eval.depth import (
    DepthLinearProbe,
    depth_metrics,
    eigen_crop_mask,
    gradient_loss,
    sig_loss,
)
from dvt_tpu.eval.glue import center_pad
from dvt_tpu.eval.seg import (
    ConfusionAccumulator,
    SegLinearProbe,
    bilinear_upsample,
    cross_entropy_ignore,
    poly_schedule,
    slide_inference,
)
from dvt_tpu.eval.vitdet import (
    LN2d,
    SimpleFPN,
    sincos_pos_embed_2d,
    window_partition,
    window_unpartition,
    windowed_attention,
)


class TestSegPieces:
    def test_cross_entropy_ignores_255(self):
        logits = jnp.zeros((1, 2, 2, 3))
        labels = jnp.array([[[0, 255], [255, 255]]])
        loss = cross_entropy_ignore(logits, labels)
        np.testing.assert_allclose(float(loss), np.log(3), rtol=1e-5)

    def test_bilinear_upsample_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F

        x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
        out = bilinear_upsample(jnp.asarray(x), (15, 21))
        t = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(t, size=(15, 21), mode="bilinear",
                            align_corners=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_poly_schedule(self):
        fn = poly_schedule(1e-3, 1000, 1.0, warmup_iters=100)
        assert float(fn(0)) < 2e-5
        assert np.isclose(float(fn(100)), 1e-3 * 0.9, rtol=0.05)
        assert float(fn(999)) < 5e-6

    def test_confusion_accumulator_miou(self):
        acc = ConfusionAccumulator(3)
        pred = np.array([0, 0, 1, 1, 2, 2])
        label = np.array([0, 1, 1, 1, 2, 255])
        acc.add(pred, label)
        # class0: i=1,u=2 -> 0.5; class1: i=1,u=4 -> ... pred1:{1,1},label1:{1,1,1}
        res = acc.results()
        assert 0 < res["mIoU"] < 100
        assert res["aAcc"] == pytest.approx(4 / 5 * 100)

    def test_miou_counts_predicted_but_absent_classes(self):
        """mmseg nanmean semantics: a class predicted but never in GT has
        union > 0 and IoU 0, and it COUNTS toward mIoU (excluding it
        inflates the metric); mAcc averages over GT-present classes."""
        acc = ConfusionAccumulator(3)
        # class 2 predicted twice, never labeled; classes 0/1 perfect
        pred = np.array([0, 0, 1, 1, 2, 2])
        label = np.array([0, 0, 1, 1, 0, 1])
        acc.add(pred, label)
        res = acc.results()
        # IoUs: c0 = 2/3, c1 = 2/3, c2 = 0/2 = 0 -> mean 4/9
        assert res["mIoU"] == pytest.approx(4 / 9 * 100)
        # mAcc over GT classes only: c0 2/3, c1 2/3
        assert res["mAcc"] == pytest.approx(2 / 3 * 100)

    def test_slide_inference_covers_everything(self):
        calls = []

        def logits_fn(x):
            calls.append(x.shape)
            return jnp.ones((*x.shape[:3], 4))

        img = np.zeros((70, 90, 3), np.float32)
        out = slide_inference(logits_fn, img, 4, crop=(32, 32), stride=(24, 24))
        assert out.shape == (70, 90, 4)
        np.testing.assert_allclose(out, 1.0)  # count-normalized overlaps

    def test_slide_inference_batched_matches_per_window(self, rng):
        """Batched window inference is bitwise-equal to the per-window
        loop (same windows, same math, count-normalized the same) across
        mixed image sizes — incl. images smaller than the crop."""
        from dvt_tpu.eval.seg import slide_inference_batched

        def logits_fn(x):
            # content-dependent so a window mix-up would be caught
            x = jnp.asarray(x)
            return jnp.stack(
                [x[..., 0], 2 * x[..., 1], x[..., 2] - x[..., 0]], -1)

        images = [
            np.asarray(rng.random((70, 90, 3)), np.float32),
            np.asarray(rng.random((40, 61, 3)), np.float32),  # < crop
            np.asarray(rng.random((70, 90, 3)), np.float32),
        ]
        batched = slide_inference_batched(
            logits_fn, images, 3, crop=(32, 32), stride=(24, 24),
            window_batch=4)
        for im, out in zip(images, batched):
            ref = slide_inference(
                lambda p: logits_fn(p),
                im, 3, crop=(32, 32), stride=(24, 24))
            np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_probe_learns_linear_task(self):
        # synthetic: class = argmax of channel triple at each location
        def feature_fn(images):
            return images  # identity "backbone": (B, h, w, 3)

        probe = SegLinearProbe(feature_fn, num_classes=3, lr=5e-2,
                               total_iters=60, warmup_iters=5)
        key = jax.random.PRNGKey(0)
        state = None
        for i in range(60):
            x = jax.random.normal(jax.random.fold_in(key, i), (4, 8, 8, 3))
            y = jnp.argmax(x, axis=-1)
            if state is None:
                state = probe.init_state(x)
            state, m = probe.train_step(state, x, y)
        x = jax.random.normal(jax.random.fold_in(key, 999), (2, 8, 8, 3))
        pred = np.asarray(probe.predict_logits(state, x)).argmax(-1)
        acc = (pred == np.asarray(jnp.argmax(x, -1))).mean()
        assert acc > 0.8, acc


class TestDepthPieces:
    def test_sig_loss_zero_for_perfect(self):
        gt = jnp.ones((4, 4)) * 2.0
        assert float(sig_loss(gt, gt)) < 1e-4

    def test_sig_loss_matches_reference_formula(self, rng):
        pred = jnp.asarray(rng.uniform(0.5, 5, (6, 6)).astype(np.float32))
        gt = jnp.asarray(rng.uniform(0.5, 5, (6, 6)).astype(np.float32))
        g = np.log(np.asarray(pred) + 1e-3) - np.log(np.asarray(gt) + 1e-3)
        ref = np.sqrt(g.var() + 0.15 * g.mean() ** 2)
        np.testing.assert_allclose(float(sig_loss(pred, gt)), ref, rtol=1e-4)

    def test_gradient_loss_nonnegative(self, rng):
        pred = jnp.asarray(rng.uniform(0.5, 5, (16, 16)).astype(np.float32))
        gt = jnp.asarray(rng.uniform(0.5, 5, (16, 16)).astype(np.float32))
        assert float(gradient_loss(pred, gt)) > 0
        assert float(gradient_loss(gt, gt)) < 1e-6

    def test_depth_metrics_identity(self):
        gt = np.full((480, 640), 2.0, np.float32)
        m = depth_metrics(gt, gt, eval_mask=eigen_crop_mask(gt.shape))
        assert m["a1"] == 1.0 and m["rmse"] == 0.0 and m["abs_rel"] == 0.0

    def test_eigen_crop(self):
        mask = eigen_crop_mask((480, 640))
        assert not mask[0, 0] and mask[100, 100]
        assert mask.sum() == (471 - 45) * (601 - 41)

    def test_depth_probe_learns_constant_depth(self):
        def feature_fn(images):
            return images

        probe = DepthLinearProbe(feature_fn, lr=1e-2, total_iters=50,
                                 warmup_iters=5)
        key = jax.random.PRNGKey(0)
        state = None
        losses = []
        for i in range(50):
            x = jax.random.normal(jax.random.fold_in(key, i), (2, 8, 8, 3))
            # depth depends on feature channel 0
            gt = 2.0 + jnp.clip(x[..., 0], -1, 1)
            if state is None:
                state = probe.init_state(x)
            state, m = probe.train_step(state, x, gt)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], (losses[0], losses[-1])


class TestViTDet:
    def test_window_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 7, 9, 4)).astype(np.float32))
        wins, padded = window_partition(x, 4)
        back = window_unpartition(wins, 4, padded, (7, 9))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)

    def test_windowed_attention_shapes(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 8)).astype(np.float32))
        out = windowed_attention(lambda t: t * 2.0, x, 4)
        assert out.shape == x.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2, atol=1e-6)

    def test_sincos_embed(self):
        pe = sincos_pos_embed_2d(64, 5, 7)
        assert pe.shape == (35, 64)
        assert np.isfinite(np.asarray(pe)).all()

    def test_simple_fpn_strides(self, rng):
        fpn = SimpleFPN(out_channels=32)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)).astype(np.float32))
        params = fpn.init(jax.random.PRNGKey(0), x)["params"]
        outs = fpn.apply({"params": params}, x)
        assert [o.shape for o in outs] == [
            (1, 32, 32, 32), (1, 16, 16, 32), (1, 8, 8, 32), (1, 4, 4, 32)
        ]

    def test_sincos_matches_reference_mae_layout(self):
        """Our sincos table == the reference's get_2d_sincos_pos_embed
        (simple_fpn.py:26-73): per-axis [sin, cos] with the x axis first
        (meshgrid(w, h) puts grid[0]=x), omega = 1/10000^(i/(D/4))."""
        d, g = 32, 5

        def ref_1d(dim, pos):  # get_1d_sincos_pos_embed_from_grid
            omega = 1.0 / 10000 ** (np.arange(dim // 2) / (dim / 2.0))
            out = np.einsum("m,d->md", pos.reshape(-1), omega)
            return np.concatenate([np.sin(out), np.cos(out)], axis=1)

        grid = np.stack(np.meshgrid(np.arange(g, dtype=np.float32),
                                    np.arange(g, dtype=np.float32)))
        ref = np.concatenate(
            [ref_1d(d // 2, grid[0]), ref_1d(d // 2, grid[1])], axis=1)
        ours = np.asarray(sincos_pos_embed_2d(d, g, g))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_simple_fpn_add_pe(self, rng):
        """add_pe (the _pe config variant, vitb_voc2012_vitdet_pe_config
        .py:72-73): at the native pe_grid the added embedding is exactly
        the sincos table; the pyramid output therefore equals running the
        plain FPN on x + pe."""
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 32)).astype(np.float32))
        fpn_pe = SimpleFPN(out_channels=16, add_pe=True, pe_grid=6)
        params = fpn_pe.init(jax.random.PRNGKey(0), x)["params"]
        outs_pe = fpn_pe.apply({"params": params}, x)
        pe = sincos_pos_embed_2d(32, 6, 6).reshape(1, 6, 6, 32)
        fpn = SimpleFPN(out_channels=16)
        outs_manual = fpn.apply({"params": params}, x + pe)
        for a, b in zip(outs_pe, outs_manual):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5)
        # resampled path (runtime grid != pe_grid) stays finite and
        # actually shifts the map
        x2 = jnp.asarray(
            rng.standard_normal((1, 9, 7, 32)).astype(np.float32))
        outs2 = SimpleFPN(out_channels=16, add_pe=True, pe_grid=6).apply(
            {"params": params}, x2)
        base2 = fpn.apply({"params": params}, x2)
        assert np.isfinite(np.asarray(outs2[0])).all()
        assert np.abs(np.asarray(outs2[0]) - np.asarray(base2[0])).max() > 1e-3


class TestGlue:
    def test_center_pad(self):
        x = jnp.zeros((1, 30, 45, 3))
        out = center_pad(x, 14)
        assert out.shape == (1, 42, 56, 3)
        out2 = center_pad(jnp.zeros((1, 28, 28, 3)), 14)
        assert out2.shape == (1, 28, 28, 3)


class TestResizeConcat:
    def test_multi_level_concat_matches_torch_semantics(self, rng):
        """resize_concat: select in_index, bilinear-resize to first, concat
        (linear_head.py:48-85)."""
        import torch
        import torch.nn.functional as F

        from dvt_tpu.eval.seg import resize_concat

        maps = [
            rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
            rng.standard_normal((2, 4, 4, 4)).astype(np.float32),
            rng.standard_normal((2, 2)).astype(np.float32),  # descriptor
        ]
        out = np.asarray(resize_concat(
            [jnp.asarray(m) for m in maps], in_index=(0, 1, 2)
        ))
        assert out.shape == (2, 8, 8, 10)
        up = F.interpolate(
            torch.from_numpy(maps[1]).permute(0, 3, 1, 2), size=(8, 8),
            mode="bilinear", align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out[..., 4:8], up, atol=1e-5)
        np.testing.assert_allclose(
            out[..., 8:], np.broadcast_to(maps[2][:, None, None, :],
                                          (2, 8, 8, 2)), atol=1e-6)

    def test_bnhead_accepts_multi_level_list(self, rng):
        from dvt_tpu.eval.seg import BNHead

        head = BNHead(num_classes=5, in_index=(1, 0))
        feats = [
            jnp.asarray(rng.standard_normal((1, 4, 4, 3)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32)),
        ]
        variables = head.init(jax.random.PRNGKey(0), feats)
        out = head.apply(variables, feats)
        assert out.shape == (1, 8, 8, 5)  # first selected level's grid


class TestSegFeatureDataset:
    def test_loads_feature_label_pairs(self, tmp_path, rng):
        from PIL import Image

        from dvt_tpu.eval.datasets import SegFeatureDataset

        feat_dir = tmp_path / "feats"
        ann_dir = tmp_path / "SegmentationClass"
        feat_dir.mkdir(); ann_dir.mkdir()
        for n in ("a", "b"):
            np.save(feat_dir / f"{n}.npy",
                    rng.standard_normal((1, 6, 6, 8)).astype(np.float32))
            Image.fromarray(
                rng.integers(0, 20, (24, 30), dtype=np.uint8).astype(np.uint8)
            ).save(ann_dir / f"{n}.png")
        np.save(feat_dir / "orphan.npy", np.zeros((1, 6, 6, 8), np.float32))

        ds = SegFeatureDataset(str(feat_dir), str(tmp_path),
                               "SegmentationClass")
        # orphan has no label on disk but a feature - it IS listed (labels
        # are checked lazily); use a split to scope
        (tmp_path / "split.txt").write_text("a\nb\n")
        ds = SegFeatureDataset(str(feat_dir), str(tmp_path),
                               "SegmentationClass", split="split.txt")
        assert len(ds) == 2
        item = ds[0]
        assert item["feature"].shape == (6, 6, 8)
        assert item["label"].shape == (24, 30)

        ds_tr = SegFeatureDataset(str(feat_dir), str(tmp_path),
                                  "SegmentationClass", split="split.txt",
                                  label_size=(16, 16))
        assert ds_tr[0]["label"].shape == (16, 16)


class TestColormaps:
    def test_voc_palette_official_values(self):
        from dvt_tpu.eval.colormaps import paint_label_map, voc_palette

        pal = voc_palette()
        # official VOC colors (bit-interleaving generator ground truth)
        assert tuple(pal[0]) == (0, 0, 0)          # background
        assert tuple(pal[1]) == (128, 0, 0)        # aeroplane
        assert tuple(pal[2]) == (0, 128, 0)        # bicycle
        assert tuple(pal[3]) == (128, 128, 0)      # bird
        assert tuple(pal[4]) == (0, 0, 128)        # boat
        assert tuple(pal[15]) == (192, 128, 128)   # person

        lab = np.array([[0, 1], [255, 15]], np.int64)
        painted = paint_label_map(lab, pal)
        assert painted.shape == (2, 2, 3)
        assert tuple(painted[0, 1]) == (128, 0, 0)
        assert tuple(painted[1, 0]) == (0, 0, 0)   # ignore -> black

    def test_ade_palette_and_overlay(self):
        from dvt_tpu.eval.colormaps import ade20k_palette, overlay, paint_label_map

        pal = ade20k_palette()
        assert pal.shape == (150, 3)
        # the OFFICIAL table has one duplicate color: (140, 140, 140) is
        # both class 7 and class 43 (reference colormaps.py rows 8 / 44)
        assert len({tuple(c) for c in pal}) == 149
        # official ADE20K constants (reference colormaps.py:6-160):
        # first rows and last row of the class table
        assert tuple(pal[0]) == (120, 120, 120)    # wall
        assert tuple(pal[1]) == (180, 120, 120)    # building
        assert tuple(pal[2]) == (6, 230, 230)      # sky
        assert tuple(pal[3]) == (80, 50, 50)       # floor
        assert tuple(pal[149]) == (92, 0, 255)     # flag (last class)
        img = np.zeros((4, 4, 3), np.uint8) + 200
        painted = paint_label_map(np.ones((4, 4), np.int64), pal)
        out = overlay(img, painted, alpha=0.5)
        assert out.shape == (4, 4, 3) and out.dtype == np.uint8


def test_mmcv_warmup_scales_current_lr():
    """mmcv get_warmup_lr multiplies the warmup factor into the CURRENT
    annealed lr - the curves must be continuous at warmup end and the
    warmup values must sit BELOW the annealed curve, not above it."""
    import numpy as np

    from dvt_tpu.eval.depth import cosine_annealing_schedule
    from dvt_tpu.eval.detection import step_schedule
    from dvt_tpu.eval.seg import poly_schedule

    cos = cosine_annealing_schedule(1e-3, 38400, warmup_iters=12800,
                                    warmup_ratio=1e-3)
    # continuity at the boundary (the old base_lr scaling jumped ~25%)
    a, b = float(cos(12799)), float(cos(12800))
    assert abs(a - b) / b < 1e-3
    # warmup never exceeds the annealed curve
    for s in (0, 1000, 6400, 12000):
        assert float(cos(s)) <= float(cos(12800)) * 1.0001

    poly = poly_schedule(1e-3, 40000, 1.0, warmup_iters=1500)
    a, b = float(poly(1499)), float(poly(1500))
    assert abs(a - b) / b < 2e-3

    step = step_schedule(1e-4)
    assert np.isclose(float(step(150)), 1e-4)
    assert np.isclose(float(step(20000)), 1e-5)
    assert np.isclose(float(step(22000)), 1e-6)
    assert float(step(0)) < 2e-7  # warmup_ratio 1e-3 of base


def test_seg_predict_logits_mesh_matches_single_device(rng):
    """VERDICT r2 #3 acceptance: the mesh-sharded predict_logits path
    (data_sharded_call over the 8-virtual-device mesh) produces the same
    slide-inference output - and therefore identical mIoU - as the
    unsharded path, including non-divisible window batches (padding +
    trim)."""
    import jax.numpy as jnp

    from dvt_tpu.eval.seg import SegLinearProbe, slide_inference_batched
    from dvt_tpu.parallel.mesh import make_mesh

    def feature_fn(images):
        x = jnp.asarray(images)
        # 8x downsample 'backbone' with content dependence
        f = x[:, ::8, ::8, :]
        return jnp.concatenate([f, f[..., :1] * 2.0], -1)

    kw = dict(lr=1e-2, weight_decay=0.0, total_iters=4, seed=0)
    p_single = SegLinearProbe(feature_fn, 3, mesh=None, **kw)
    p_mesh = SegLinearProbe(feature_fn, 3, mesh=make_mesh(), **kw)
    ex = jnp.zeros((1, 32, 32, 3), jnp.float32)
    s1, s2 = p_single.init_state(ex), p_mesh.init_state(ex)

    images = [np.asarray(rng.random((48, 56, 3)), np.float32)
              for _ in range(3)]  # 3 imgs x 4 windows = 12 (not / 8)
    outs = []
    for probe, state in ((p_single, s1), (p_mesh, s2)):
        maps = slide_inference_batched(
            lambda b, probe=probe, state=state:
                probe.predict_logits(state, b),
            images, 3, crop=(32, 32), stride=(24, 24), window_batch=8)
        outs.append([np.asarray(m) for m in maps])
    for a, b in zip(*outs):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


class TestDepthSlideInference:
    """depth_slide_inference (DepthEncoderDecoder.slide counterpart,
    reference evaluation/depth/models/depther/encoder_decoder.py:146-259)."""

    def test_matches_whole_for_content_local_fn(self, rng):
        import jax.numpy as jnp

        from dvt_tpu.eval.depth import depth_slide_inference

        img = rng.standard_normal((10, 12, 3)).astype(np.float32)
        fn = lambda b: jnp.asarray(b)[..., 0] ** 2 + jnp.asarray(b)[..., 1]
        out = depth_slide_inference(fn, img, crop=(6, 6), stride=(4, 4))
        expected = np.asarray(fn(img[None]))[0]
        np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)

    def test_crop_larger_than_image_is_single_window(self, rng):
        import jax.numpy as jnp

        from dvt_tpu.eval.depth import depth_slide_inference

        img = rng.standard_normal((8, 9, 3)).astype(np.float32)
        calls = []

        def fn(b):
            calls.append(np.asarray(b).shape)
            return jnp.asarray(b)[..., 0]

        out = depth_slide_inference(fn, img, crop=(32, 32), stride=(16, 16))
        assert calls == [(1, 8, 9, 3)]  # crop clamped to the image
        np.testing.assert_allclose(out, img[..., 0])

    def test_overlap_regions_average_window_predictions(self, rng):
        """Windows that disagree on their overlap must be count-averaged
        (the reference's preds/count division)."""
        import jax.numpy as jnp

        from dvt_tpu.eval.depth import depth_slide_inference

        img = rng.standard_normal((4, 10, 3)).astype(np.float32)
        # each window predicts a CONSTANT map (its own mean) so overlap
        # zones expose the averaging
        fn = lambda b: jnp.full(jnp.asarray(b).shape[:3],
                                jnp.mean(jnp.asarray(b)))
        out = depth_slide_inference(fn, img, crop=(4, 6), stride=(4, 4))
        m0 = img[:, 0:6].mean()
        m1 = img[:, 4:10].mean()
        np.testing.assert_allclose(out[:, 0:4], m0, rtol=1e-6)
        np.testing.assert_allclose(out[:, 4:6], (m0 + m1) / 2, rtol=1e-6)
        np.testing.assert_allclose(out[:, 6:10], m1, rtol=1e-6)
