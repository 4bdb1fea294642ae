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
