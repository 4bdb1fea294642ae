"""Visualization + kmeans + collect_results tests."""

import json
import os

import jax
import numpy as np
import pytest

from dvt_tpu.utils.kmeans import cosine_kmeans
from dvt_tpu.utils.visualization import (
    add_border,
    add_label,
    get_cluster_map,
    get_pca_map,
    get_robust_pca,
    get_scale_map,
    get_similarity_map,
    hcat,
    vcat,
    visualize_online_denoised_samples,
)


class TestKmeans:
    def test_separates_two_clusters(self):
        rng = np.random.default_rng(0)
        a = rng.normal([5, 0, 0], 0.1, (50, 3))
        b = rng.normal([0, 5, 0], 0.1, (50, 3))
        feats = np.concatenate([a, b]).astype(np.float32)
        labels = np.asarray(
            cosine_kmeans(jax.random.PRNGKey(0), feats, num_clusters=2)
        )
        assert len(set(labels[:50])) == 1
        assert len(set(labels[50:])) == 1
        assert labels[0] != labels[50]


class TestMaps:
    def test_pca_map_shape_and_range(self, rng):
        feats = rng.standard_normal((7, 7, 32)).astype(np.float32)
        img = get_pca_map(feats, (28, 28))
        assert img.shape == (28, 28, 3)
        assert img.min() >= 0 and img.max() <= 1

    def test_pca_stats_reuse(self, rng):
        feats = rng.standard_normal((7, 7, 16)).astype(np.float32)
        _, stats = get_pca_map(feats, (14, 14), return_pca_stats=True)
        again = get_pca_map(feats, (14, 14), pca_stats=stats)
        first = get_pca_map(feats, (14, 14), pca_stats=stats)
        np.testing.assert_allclose(first, again)

    def test_scale_similarity_cluster_maps(self, rng):
        feats = rng.standard_normal((9, 9, 16)).astype(np.float32)
        assert get_scale_map(feats, (18, 18)).shape == (18, 18, 3)
        sim = get_similarity_map(feats, (18, 18))
        assert sim.shape == (18, 18, 3)
        cl = get_cluster_map(feats, (18, 18), num_clusters=4)
        assert cl.shape == (18, 18, 3)

    def test_robust_pca_range_excludes_outliers(self, rng):
        feats = rng.standard_normal((500, 8)).astype(np.float32)
        feats[0] *= 100  # gross outlier
        red, cmin, cmax = get_robust_pca(feats)
        colors = feats @ red
        # outlier should fall outside the robust range on its main axis
        assert (colors[0] < cmin).any() or (colors[0] > cmax).any()


class TestLayout:
    def test_hcat_vcat_border_label(self, rng):
        a = rng.random((10, 12, 3)).astype(np.float32)
        b = rng.random((8, 5, 3)).astype(np.float32)
        h = hcat(a, b, gap=3)
        assert h.shape == (10, 12 + 3 + 5, 3)
        v = vcat(a, b, gap=2)
        assert v.shape == (10 + 2 + 8, 12, 3)
        bo = add_border(a, width=4)
        assert bo.shape == (18, 20, 3)
        lab = add_label(a, "hi", font_size=12)
        assert lab.shape[0] > a.shape[0] and lab.shape[1] == a.shape[1]

    def test_online_panel(self, rng):
        imgs = rng.random((2, 16, 16, 3)).astype(np.float32)
        feats = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
        panel = visualize_online_denoised_samples(
            imgs, feats, feats, feats, num_samples=2
        )
        assert panel.dtype == np.uint8
        assert panel.shape[2] == 3


class TestCollectResults:
    def test_best_entry_and_table(self, tmp_path):
        from dvt_tpu.eval.collect_results import collect, print_table

        d = tmp_path / "voc_run"
        os.makedirs(d)
        with open(d / "eval_metrics.json", "w") as f:
            f.write(json.dumps({"mIoU": 80.1, "mAcc": 88.0, "iteration": 1}) + "\n")
            f.write(json.dumps({"mIoU": 83.5, "mAcc": 90.6, "iteration": 2}) + "\n")
            f.write(json.dumps({"mIoU": 82.0, "mAcc": 89.0, "iteration": 3}) + "\n")
        res = collect(str(tmp_path))
        assert res["voc_run"]["mIoU"] == 83.5
        table = print_table(res)
        assert "voc_run" in table and "83.5" in table

    def test_det_dirs_pick_best_map50(self, tmp_path):
        from dvt_tpu.eval.collect_results import collect

        d = tmp_path / "eval_voc_det"
        os.makedirs(d)
        with open(d / "eval_metrics.json", "w") as f:
            f.write(json.dumps({"mAP50": 0.31, "iteration": 1}) + "\n")
            f.write(json.dumps({"mAP50": 0.55, "iteration": 2}) + "\n")
            f.write(json.dumps({"mAP50": 0.42, "iteration": 3}) + "\n")
        res = collect(str(tmp_path))
        assert res["eval_voc_det"]["mAP50"] == 0.55
