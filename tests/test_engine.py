"""End-to-end stage-1 engine test on a tiny backbone (CPU)."""

import numpy as np
import pytest

from dvt_tpu.models.zoo import ViTConfig, register_model

register_model(
    ViTConfig(
        name="vit_tiny_patch8_32.test",
        embed_dim=32,
        depth=2,
        num_heads=2,
        patch_size=8,
        pretrain_img_size=32,
    )
)


@pytest.fixture(scope="module")
def engine():
    from dvt_tpu.engine import Stage1Engine

    return Stage1Engine(
        model_identifier="vit_tiny_patch8_32.test",
        stride=8,
        input_size=(32, 32),
        num_views=8,
        num_iters=60,
        warmup_iters=6,
        n_levels=3,
        pixel_bsz=64,
        extract_bsz=4,
        images_per_batch=2,
    )


def test_extract_shapes(engine, rng):
    img = (rng.random((48, 40, 3)) * 255).astype(np.uint8)
    feats, coords = engine.extract_image(img)
    assert feats.shape == (9, 4, 4, 32)  # 8 views + full image
    assert coords.shape == (9, 4, 4, 2)
    c = np.asarray(coords)
    assert c.min() >= 0.0 and c.max() <= 1.0
    # the full-image slot uses the [0,1] grid
    np.testing.assert_allclose(c[-1, 0, 0], [0, 0], atol=1e-6)
    np.testing.assert_allclose(c[-1, -1, -1], [1, 1], atol=1e-6)


def test_denoise_batch_and_save(engine, rng, tmp_path):
    imgs = [(rng.random((32, 32, 3)) * 255).astype(np.uint8) for _ in range(2)]
    raw, denoised, metrics = engine.denoise_batch(imgs)
    assert raw.shape == (2, 4, 4, 32)
    assert denoised.shape == (2, 4, 4, 32)
    assert np.isfinite(denoised).all()
    losses = metrics["loss_history"]
    assert losses.shape == (2, 60)
    assert np.isfinite(losses).all()

    # filesystem contract
    p_raw, p_den = engine.save_features(
        str(tmp_path), "", "img0.jpg", raw[0], denoised[0]
    )
    assert engine.already_done(str(tmp_path), "", "img0.jpg")
    assert np.load(p_den).shape == (4, 4, 32)
    assert "raw_features" in p_raw and "denoised_features" in p_den


def test_vis_panel(engine, rng):
    imgs = [(rng.random((32, 32, 3)) * 255).astype(np.uint8)]
    raw, denoised, metrics, panels = engine.denoise_batch_with_vis(imgs)
    assert len(panels) == 1
    panel = panels[0]
    assert panel.dtype == np.uint8 and panel.ndim == 3 and panel.shape[2] == 3
    assert panel.shape[0] > 32 and panel.shape[1] > 32 * 10  # 12 columns


def test_extract_bsz_clamps_to_divisor():
    """A non-divisor extract_bsz (e.g. the measured-default 128 with
    --num_views 192) must round down to the largest divisor, not crash -
    the lax.map chunk width is bit-identical at any divisor."""
    from dvt_tpu.engine import Stage1Engine

    e = Stage1Engine(
        model_identifier="vit_tiny_patch8_32.test",
        stride=8, input_size=(32, 32),
        num_views=12, num_iters=4, warmup_iters=1,
        n_levels=3, pixel_bsz=64,
        extract_bsz=8,  # 12 % 8 != 0 -> clamp to 6
        images_per_batch=1,
    )
    assert e.extract_bsz == 6
