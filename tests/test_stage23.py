"""Stage-2 denoiser training and stage-3 distillation over the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvt_tpu.models.vit import VisionTransformer, ViTWrapper
from dvt_tpu.models.zoo import ViTConfig
from dvt_tpu.parallel.mesh import make_mesh
from dvt_tpu.stage2 import Stage2Config, Stage2Trainer, denoise_loss
from dvt_tpu.stage3 import Stage3Config, Stage3Trainer


def test_denoise_loss_zero_at_identity():
    x = jnp.ones((2, 4, 4, 8))
    loss, metrics = denoise_loss(x, x)
    assert float(loss) < 1e-6
    assert set(metrics) >= {"l2_loss", "cosine_similarity_loss", "loss"}


class TestStage2:
    def test_training_reduces_loss_on_mesh(self):
        mesh = make_mesh()  # all 8 virtual devices on data axis
        cfg = Stage2Config(
            feat_dim=32,
            noise_map_height=6,
            noise_map_width=6,
            num_iterations=120,
            global_batch_size=16,
            blr=1e-2,
        )
        trainer = Stage2Trainer(cfg, mesh, seed=0)

        # synthetic task: denoised = raw - fixed artifact
        key = jax.random.PRNGKey(0)
        artifact = jax.random.normal(key, (6, 6, 32)) * 0.5
        losses = []
        for i in range(120):
            k = jax.random.fold_in(key, i)
            clean = jax.random.normal(k, (16, 6, 6, 32))
            raw = clean + artifact
            m = trainer.train_step(raw, clean)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    def test_predict_shape_and_dynamic_grid(self):
        mesh = make_mesh()
        cfg = Stage2Config(feat_dim=32, noise_map_height=6, noise_map_width=6)
        trainer = Stage2Trainer(cfg, mesh, seed=0)
        out = trainer.predict(jnp.zeros((2, 6, 6, 32)))
        assert out.shape == (2, 6, 6, 32)
        # pos-embed resamples to a different runtime grid
        out2 = trainer.predict(jnp.zeros((2, 9, 5, 32)))
        assert out2.shape == (2, 9, 5, 32)


class TestStage3:
    def test_distillation_step_runs_and_descends(self):
        cfg3 = Stage3Config(
            model="vit_base_patch16_224.dino",  # placeholder identifier
            stride=8,
            input_size=32,
            num_iterations=30,
            global_batch_size=8,
            blr=1e-3,
            compute_dtype=jnp.float32,
        )
        # swap in a tiny vit config to keep the test fast
        tiny = ViTConfig(
            name="tiny", embed_dim=32, depth=2, num_heads=2, patch_size=8,
            pretrain_img_size=32,
        )
        object.__setattr__(cfg3, "_tiny", tiny)
        Stage3Config.vit_cfg = property(lambda self: tiny)  # type: ignore

        mesh = make_mesh()
        vit = VisionTransformer(tiny, stride=cfg3.stride)
        x0 = jnp.zeros((1, 32, 32, 3))
        sp = vit.init(jax.random.PRNGKey(0), x0)["params"]
        tp = vit.init(jax.random.PRNGKey(1), x0)["params"]

        from dvt_tpu.models.online_denoiser import Denoiser

        gh, gw = cfg3.feat_grid
        dn = Denoiser(noise_map_height=gh, noise_map_width=gw, feat_dim=32)
        dp = dn.init(jax.random.PRNGKey(2), jnp.zeros((1, gh, gw, 32)))["params"]

        trainer = Stage3Trainer(cfg3, mesh, sp, tp, dp, seed=0)
        key = jax.random.PRNGKey(3)
        losses = []
        for i in range(30):
            imgs = jax.random.normal(jax.random.fold_in(key, i), (8, 32, 32, 3))
            m = trainer.train_step(imgs)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], (losses[0], losses[-1])


class TestSequenceParallel:
    """Sequence parallelism (stage-3 ``sequence_parallel``): activation
    tokens sharded over the 'model' axis — the stride-4 distillation
    memory lever (RESULTS.md §8b: 16k-token training OOMs a single chip).
    The partitioned program must be the unpartitioned math exactly (the
    softmax reduces along the unsharded key dim; no collective crosses it).
    """

    def _setup(self, seq_tokens_odd=False):
        tiny = ViTConfig(
            name="tiny", embed_dim=32, depth=2, num_heads=2, patch_size=8,
            pretrain_img_size=32,
        )
        # stride 6 -> 5x5 grid + cls = 26 tokens: NOT divisible by the
        # 4-device model axis, exercising GSPMD's padded partitioning
        stride = 6 if seq_tokens_odd else 8
        cfg = dict(
            model="vit_base_patch16_224.dino",
            stride=stride, input_size=32, num_iterations=10,
            global_batch_size=8, blr=1e-3, compute_dtype=jnp.float32,
            vit_cfg_override=tiny,
        )
        vit = VisionTransformer(tiny, stride=stride)
        x0 = jnp.zeros((1, 32, 32, 3))
        sp = vit.init(jax.random.PRNGKey(0), x0)["params"]
        tp = vit.init(jax.random.PRNGKey(1), x0)["params"]
        from dvt_tpu.models.online_denoiser import Denoiser

        g = (32 - 8) // stride + 1
        dn = Denoiser(noise_map_height=g, noise_map_width=g, feat_dim=32)
        dp = dn.init(jax.random.PRNGKey(2), jnp.zeros((1, g, g, 32)))["params"]
        return cfg, sp, tp, dp

    def test_matches_data_parallel(self):
        cfg_kw, sp, tp, dp = self._setup(seq_tokens_odd=True)
        mesh = make_mesh(model=4)  # 2 data x 4 model
        # each trainer donates its own state buffers: hand them copies
        copy = lambda t: jax.tree.map(jnp.copy, t)
        t_dp = Stage3Trainer(Stage3Config(**cfg_kw), mesh,
                             copy(sp), copy(tp), copy(dp))
        t_sq = Stage3Trainer(
            Stage3Config(sequence_parallel=True, **cfg_kw), mesh,
            copy(sp), copy(tp), copy(dp))
        key = jax.random.PRNGKey(3)
        for i in range(3):
            imgs = jax.random.normal(jax.random.fold_in(key, i), (8, 32, 32, 3))
            m_dp = t_dp.train_step(imgs)
            m_sq = t_sq.train_step(imgs)
            np.testing.assert_allclose(
                float(m_dp["loss"]), float(m_sq["loss"]), rtol=1e-5)
        # Param tolerance: GSPMD repartitioning changes fp32 reduction
        # order (~1e-7 grad noise), and Adam's m/sqrt(v) normalization
        # amplifies that to a few percent of an LR-sized step on
        # small-gradient params — so a few e-5 absolute after 3 steps is
        # the partitioning-noise floor, not a math difference (the
        # per-step losses above match at rtol 1e-5).
        a = jax.tree.leaves(t_dp.state["params"])
        b = jax.tree.leaves(t_sq.state["params"])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=5e-5, rtol=1e-3)

    def test_forward_sharding_is_token_dim(self):
        """The residual stream really is sharded over 'model' tokens."""
        cfg_kw, sp, _, _ = self._setup()
        tiny = cfg_kw["vit_cfg_override"]
        mesh = make_mesh(model=4)
        vit = VisionTransformer(tiny, stride=8, seq_mesh=mesh,
                                seq_axis="model")

        @jax.jit
        def fwd(p, x):
            return vit.apply({"params": p}, x, norm=True)[-1]

        out = fwd(sp, jnp.zeros((2, 32, 32, 3)))
        assert out.shape == (2, 4, 4, 32)
        # and it equals the unsharded forward bitwise-close
        ref = VisionTransformer(tiny, stride=8).apply(
            {"params": sp}, jnp.zeros((2, 32, 32, 3)), norm=True)[-1]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_tp_and_sp_mutually_exclusive(self):
        cfg_kw, sp, tp, dp = self._setup()
        mesh = make_mesh(model=4)
        with pytest.raises(ValueError, match="model"):
            Stage3Trainer(
                Stage3Config(sequence_parallel=True, tensor_parallel=True,
                             **cfg_kw), mesh, sp, tp, dp)

    def test_flash_plus_sp_rejected(self):
        cfg_kw, sp, _, _ = self._setup()
        tiny = cfg_kw["vit_cfg_override"]
        mesh = make_mesh(model=4)
        vit = VisionTransformer(tiny, stride=8, seq_mesh=mesh,
                                seq_axis="model", attention_impl="flash")
        with pytest.raises(ValueError, match="einsum"):
            vit.apply({"params": sp}, jnp.zeros((1, 32, 32, 3)))


def test_denoiser_from_params_matches_checkpoint_config():
    """Stage-2 checkpoints carry their grid (pos_embed tokens) and depth
    (blocks_N); reconstructing with defaults would crash on non-37x37
    grids and silently drop blocks beyond the first."""
    import jax
    import jax.numpy as jnp

    from dvt_tpu.models.online_denoiser import Denoiser, denoiser_from_params

    src = Denoiser(noise_map_height=8, noise_map_width=8, feat_dim=32,
                   num_blocks=2)
    params = src.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 8, 32)))["params"]
    d = denoiser_from_params(params, 32)
    assert (d.noise_map_height, d.noise_map_width) == (8, 8)
    assert d.num_blocks == 2 and d.enable_pe
    # and the rebuilt module actually consumes the checkpoint params
    out = d.apply({"params": params}, jnp.zeros((1, 8, 8, 32)))
    assert out.shape == (1, 8, 8, 32)
