"""Native host-pipeline tests (C++ loader vs the Python path)."""

import numpy as np
import pytest

from dvt_tpu.data.native import (
    load_batch_native,
    load_image_native,
    native_available,
    resize_bicubic_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


def test_resize_matches_python_aa_matrices(rng):
    from dvt_tpu.ops.resample import _resize_matrix

    img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    out = resize_bicubic_native(img, (37, 41))
    wh = _resize_matrix(48, 37, True)
    ww = _resize_matrix(64, 41, True)
    ref = np.einsum("oh,hwc->owc", wh, img.astype(np.float32))
    ref = np.einsum("ow,hwc->hoc", ww, ref)
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_jpeg_roundtrip(tmp_path, rng):
    from PIL import Image

    img = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(img).save(p, quality=95)

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    out = load_image_native(p, (32, 32), mean, std)
    assert out is not None and out.shape == (32, 32, 3)

    # python path on the SAME decoded pixels should be close (jpeg lossy, so
    # compare against PIL decode of the same file)
    dec = np.asarray(Image.open(p).convert("RGB"))
    ref = resize_bicubic_native(dec, (32, 32)) / 255.0
    ref = (ref - mean) / std
    np.testing.assert_allclose(out, ref, atol=0.2)
    assert abs(out.mean() - ref.mean()) < 0.02


def test_npy_batch_reader(tmp_path, rng):
    from dvt_tpu.data.native import load_npy_batch_native

    a = rng.normal(size=(5, 7)).astype(np.float32)
    b = rng.normal(size=(5, 7)).astype(np.float16)
    np.save(tmp_path / "a.npy", a)
    np.save(tmp_path / "b.npy", b)
    np.save(tmp_path / "wrong.npy", np.zeros((3, 3), np.float32))
    out, status = load_npy_batch_native(
        [str(tmp_path / n) for n in ("a.npy", "b.npy", "wrong.npy")], (5, 7)
    )
    assert status[0] == 0 and status[1] == 0
    assert status[2] != 0  # element-count mismatch flagged, not truncated
    np.testing.assert_array_equal(out[0], a)
    np.testing.assert_array_equal(out[1], b.astype(np.float32))


def test_paired_batch_matches_python_path(tmp_path, rng):
    """Stage-2 native fast path == per-item __getitem__ (features exact,
    image within the PIL path's post-resize uint8 quantization)."""
    from PIL import Image

    from dvt_tpu.data.paired_list import PairedListDataset

    img_root = tmp_path / "imgs"
    feat = tmp_path / "feats" / "denoised_features" / "m"
    raw = tmp_path / "feats" / "raw_features" / "m"
    for d in (img_root, feat, raw):
        d.mkdir(parents=True)
    rels = []
    for i in range(3):
        rel = f"im{i}.jpg"
        Image.fromarray(
            (rng.random((37, 53, 3)) * 255).astype(np.uint8)
        ).save(img_root / rel, quality=95)
        np.save(feat / f"im{i}.npy",
                rng.normal(size=(1, 25, 8)).astype(np.float32))
        np.save(raw / f"im{i}.npy",
                rng.normal(size=(1, 25, 8)).astype(np.float32))
        rels.append(rel)
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(rels))
    ds = PairedListDataset(str(img_root), str(lst), str(feat),
                           input_size=(20, 24))
    batch = ds.get_batch([0, 2, 1])
    assert batch is not None
    for k, i in [(0, 0), (1, 2), (2, 1)]:
        item = ds[i]
        np.testing.assert_array_equal(batch["original_feats"][k],
                                      item["original_feats"])
        np.testing.assert_array_equal(batch["denoised_feats"][k],
                                      item["denoised_feats"])
        # image: native is float-exact AA bicubic; the PIL path both
        # rounds to uint8 after resize AND runs PIL's two-pass 8bpc
        # fixed-point resample (horizontal pass quantized to uint8
        # before the vertical pass) - see dvt_host.cpp header
        assert np.abs(batch["image"][k] - item["image"]).max() < 0.03


def test_paired_batch_feature_only(tmp_path, rng):
    """include_image=False: native batch carries (feats, index), no image
    decode; index maps back to the sample via image_for_index; a
    wrong-shaped feature heals via resample and updates the index."""
    from PIL import Image

    from dvt_tpu.data.paired_list import PairedListDataset

    img_root = tmp_path / "imgs"
    feat = tmp_path / "feats" / "denoised_features" / "m"
    raw = tmp_path / "feats" / "raw_features" / "m"
    for d in (img_root, feat, raw):
        d.mkdir(parents=True)
    rels = []
    for i in range(3):
        rel = f"im{i}.jpg"
        Image.fromarray(
            (rng.random((30, 30, 3)) * 255).astype(np.uint8)
        ).save(img_root / rel, quality=95)
        np.save(feat / f"im{i}.npy",
                rng.normal(size=(1, 9, 4)).astype(np.float32))
        np.save(raw / f"im{i}.npy",
                rng.normal(size=(1, 9, 4)).astype(np.float32))
        rels.append(rel)
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(rels))
    ds = PairedListDataset(str(img_root), str(lst), str(feat),
                           input_size=(16, 16), include_image=False)
    ds_img = PairedListDataset(str(img_root), str(lst), str(feat),
                               input_size=(16, 16))
    batch = ds.get_batch([2, 0, 1])
    assert batch is not None and "image" not in batch
    np.testing.assert_array_equal(batch["index"], [2, 0, 1])
    for k, i in [(0, 2), (1, 0), (2, 1)]:
        item = ds_img[i]
        np.testing.assert_array_equal(batch["original_feats"][k],
                                      item["original_feats"])
        np.testing.assert_array_equal(batch["denoised_feats"][k],
                                      item["denoised_feats"])
        # on-demand vis image == the full path's per-sample image
        np.testing.assert_array_equal(
            ds.image_for_index(int(batch["index"][k])), item["image"])
    # per-item Python path agrees
    it = ds[1]
    assert int(it["index"]) == 1 and "image" not in it
    # heal: wrong-shaped raw .npy -> row resampled to an intact sample
    # and the index field follows it
    np.save(raw / "im1.npy", np.zeros((1, 5, 4), np.float32))
    batch = ds.get_batch([0, 1, 2])
    assert batch is not None
    healed_idx = int(batch["index"][1])
    assert healed_idx in (0, 2)
    np.testing.assert_array_equal(
        batch["original_feats"][1], ds_img[healed_idx]["original_feats"])


def test_batch_load_and_missing_file(tmp_path, rng):
    from PIL import Image

    good = str(tmp_path / "a.jpg")
    Image.fromarray(
        (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    ).save(good)
    bad = str(tmp_path / "missing.jpg")
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    res = load_batch_native([good, bad], (16, 16), mean, std)
    assert res is not None
    batch, status = res
    assert batch.shape == (2, 16, 16, 3)
    assert status[0] == 0 and status[1] != 0


def test_paired_batch_per_item_fallback(tmp_path, rng):
    """A transient per-file failure (feature .npy mid-write) must NOT
    disable the fast path: the failed sample is reloaded via the Python
    path, the rest keep the native result."""
    from PIL import Image

    from dvt_tpu.data.paired_list import PairedListDataset

    img_root = tmp_path / "imgs"
    feat = tmp_path / "feats" / "denoised_features" / "m"
    raw = tmp_path / "feats" / "raw_features" / "m"
    for d in (img_root, feat, raw):
        d.mkdir(parents=True)
    rels = []
    for i in range(3):
        rel = f"im{i}.jpg"
        Image.fromarray(
            (rng.random((30, 30, 3)) * 255).astype(np.uint8)
        ).save(img_root / rel, quality=95)
        np.save(feat / f"im{i}.npy",
                rng.normal(size=(1, 9, 4)).astype(np.float32))
        np.save(raw / f"im{i}.npy",
                rng.normal(size=(1, 9, 4)).astype(np.float32))
        rels.append(rel)
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(rels))
    ds = PairedListDataset(str(img_root), str(lst), str(feat),
                           input_size=(16, 16))
    ds.get_batch([0, 1, 2])  # probe feat shape while files are intact
    # truncate one raw .npy to an element-count mismatch (native read
    # flags it; the file still EXISTS so _resolve keeps the index)
    np.save(raw / "im1.npy", np.zeros((1, 5, 4), np.float32))
    batch = ds.get_batch([0, 1, 2])
    assert batch is not None  # fast path stays alive
    item0 = ds[0]
    np.testing.assert_array_equal(batch["original_feats"][0],
                                  item0["original_feats"])
    # the failed sample was healed: the wrong-shaped retry triggered the
    # reference's resample-on-missing semantics, so row 1 now holds one
    # of the intact samples (0 or 2)
    healed = batch["original_feats"][1]
    assert healed.shape == (9, 4)
    assert any(np.array_equal(healed, ds[j]["original_feats"])
               for j in (0, 2))
    assert np.isfinite(batch["image"]).all()
