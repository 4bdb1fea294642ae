"""Full 3-stage pipeline integration on a tiny backbone (CPU).

Exercises the real data contracts end to end: stage-1 engine writes
reference-layout .npy features -> PairedListDataset reads them -> stage-2
trainer fits the denoiser -> stage-3 distills the student against the
(ViT + stage-2 denoiser) teacher. Asserts each stage's losses descend and
artifacts round-trip through the filesystem.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from dvt_tpu.models.zoo import ViTConfig, register_model

register_model(
    ViTConfig(
        name="vit_e2e_patch8_32.test",
        embed_dim=32,
        depth=1,
        num_heads=2,
        patch_size=8,
        pretrain_img_size=32,
    )
)


@pytest.mark.parametrize("seed", [0])
def test_three_stage_chain(tmp_path, rng, seed):
    from dvt_tpu.data.paired_list import PairedListDataset
    from dvt_tpu.engine import Stage1Engine
    from dvt_tpu.models.online_denoiser import Denoiser
    from dvt_tpu.models.vit import VisionTransformer
    from dvt_tpu.parallel.mesh import make_mesh
    from dvt_tpu.stage2 import Stage2Config, Stage2Trainer
    from dvt_tpu.stage3 import Stage3Config, Stage3Trainer

    # --- data: 2 images on disk ---
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    names = []
    for i in range(2):
        n = f"x{i}.jpg"
        Image.fromarray(
            (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        ).save(img_dir / n)
        names.append(n)
    (tmp_path / "list.txt").write_text("\n".join(names))

    # --- stage 1: fit + save in reference layout ---
    engine = Stage1Engine(
        model_identifier="vit_e2e_patch8_32.test",
        stride=8,
        input_size=(32, 32),
        num_views=8,
        num_iters=40,
        warmup_iters=4,
        n_levels=3,
        pixel_bsz=64,
        extract_bsz=4,
        images_per_batch=2,
        fit_chunk_iters=20,
        seed=seed,
    )
    paths = [str(img_dir / n) for n in names]
    raw, denoised, metrics = engine.denoise_batch(paths)
    assert np.isfinite(metrics["loss_history"]).all()
    save_root = str(tmp_path / "feats")
    for i, p in enumerate(paths):
        engine.save_features(save_root, str(img_dir), p, raw[i], denoised[i])
        assert engine.already_done(save_root, str(img_dir), p)

    # --- stage 2: train denoiser on the saved features ---
    feat_root = os.path.join(
        save_root, "denoised_features", "vit_e2e_patch8_32.test"
    )
    ds = PairedListDataset(
        str(img_dir), str(tmp_path / "list.txt"), feat_root,
        input_size=(32, 32),
    )
    item = ds[0]
    assert item["original_feats"].shape == (4, 4, 32)

    mesh = make_mesh(data=2)
    cfg2 = Stage2Config(
        feat_dim=32, noise_map_height=4, noise_map_width=4,
        num_iterations=30, global_batch_size=2, blr=5e-3,
    )
    trainer2 = Stage2Trainer(cfg2, mesh, seed=seed)
    losses2 = []
    for _ in range(30):
        batch_raw = jnp.stack(
            [ds[0]["original_feats"], ds[1]["original_feats"]]
        )
        batch_den = jnp.stack(
            [ds[0]["denoised_feats"], ds[1]["denoised_feats"]]
        )
        m = trainer2.train_step(batch_raw, batch_den)
        losses2.append(float(m["loss"]))
    assert losses2[-1] < losses2[0], (losses2[0], losses2[-1])

    # --- stage 3: distill with the stage-2 denoiser as part of the teacher ---
    tiny = ViTConfig(
        name="vit_e2e_patch8_32.test", embed_dim=32, depth=1, num_heads=2,
        patch_size=8, pretrain_img_size=32,
    )
    cfg3 = Stage3Config(
        stride=8, input_size=32, num_iterations=40, global_batch_size=2,
        blr=2e-3, compute_dtype=jnp.float32,
    )
    object.__setattr__(
        cfg3, "__class__",
        type("C", (Stage3Config,), {"vit_cfg": property(lambda s: tiny)}),
    )
    vit = VisionTransformer(tiny, stride=8)
    x0 = jnp.zeros((1, 32, 32, 3))
    student = vit.init(jax.random.PRNGKey(seed), x0)["params"]
    teacher = engine.vit.params  # the stage-1 backbone as teacher ViT
    trainer3 = Stage3Trainer(
        cfg3, mesh, student, teacher,
        jax.device_get(trainer2.state["params"]), seed=seed,
    )
    losses3 = []
    imgs = jax.random.normal(jax.random.PRNGKey(100), (2, 32, 32, 3))
    for i in range(40):  # fixed batch: the student must overfit the teacher
        m = trainer3.train_step(imgs)
        losses3.append(float(m["loss"]))
    assert np.isfinite(losses3).all()
    assert losses3[-1] < losses3[0] * 0.9, (losses3[0], losses3[-1])
