"""Stage-1 engine tests: the vmapped neural-field fit must actually denoise.

Synthetic setup mirroring the reference's generative model: every view's raw
feature = clean(coords) + artifact(view position) (+ noise). A correct fit
separates the two: the field output matches `clean` far better than the raw
features do.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvt_tpu.stage1 import (
    Stage1Config,
    fit_image_batch,
    fit_one_image,
    lr_at,
    make_patch_coordinates,
)


def small_cfg(**kw):
    base = dict(
        feat_dim=16,
        noise_map_height=8,
        noise_map_width=8,
        n_levels=4,
        num_views=48,
        num_iters=1000,
        warmup_iters=100,
        pixel_bsz=512,
    )
    base.update(kw)
    return Stage1Config(**base)


def synth_problem(cfg, key):
    """Views of a synthetic image with a position-dependent artifact."""
    h, w = cfg.grid_hw
    kc, ka, kv = jax.random.split(key, 3)
    # smooth "clean" function of global coords: random low-freq fourier feats
    freqs = jax.random.normal(kc, (2, cfg.feat_dim)) * 3.0
    phase = jax.random.uniform(kc, (cfg.feat_dim,)) * 6.28

    def clean(coords):  # (..., 2) -> (..., C)
        return jnp.sin(coords @ freqs + phase)

    artifact = jax.random.normal(ka, (h, w, cfg.feat_dim)) * 0.5

    views, coords = [], []
    full = make_patch_coordinates(h, w, 0.0, 1.0)
    for i in range(cfg.num_views):
        k = jax.random.fold_in(kv, i)
        # random crop window in [0,1]
        xy0 = jax.random.uniform(k, (2,)) * 0.5
        size = 0.3 + jax.random.uniform(jax.random.fold_in(k, 1), (2,)) * 0.4
        ys = xy0[1] + jnp.linspace(0, size[1], h)
        xs = xy0[0] + jnp.linspace(0, size[0], w)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        c = jnp.stack([gx, gy], axis=-1)
        c = jnp.clip(c, 0, 1)
        coords.append(c)
        views.append(clean(c) + artifact)
    coords.append(full)
    views.append(clean(full) + artifact)
    raw = jnp.stack(views)  # (V+1, h, w, C)
    crd = jnp.stack(coords)
    return raw, crd, clean(full), artifact


def cos(a, b):
    a = a.reshape(-1)
    b = b.reshape(-1)
    return float(a @ b / (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-8))


class TestLrSchedule:
    def test_warmup_and_cosine(self):
        cfg = small_cfg()
        assert float(lr_at(cfg, jnp.array(0))) == 0.0
        assert np.isclose(float(lr_at(cfg, jnp.array(cfg.warmup_iters))), cfg.lr)
        mid = float(lr_at(cfg, jnp.array(cfg.num_iters // 2)))
        assert cfg.min_lr < mid < cfg.lr
        end = float(lr_at(cfg, jnp.array(cfg.num_iters)))
        assert np.isclose(end, cfg.min_lr, atol=1e-6)


class TestFit:
    def test_fit_denoises_synthetic_image(self):
        cfg = small_cfg()
        raw, coords, clean_full, artifact = synth_problem(
            cfg, jax.random.PRNGKey(0)
        )
        denoised, metrics = jax.jit(
            lambda k, r, c: fit_one_image(k, r, c, cfg)
        )(jax.random.PRNGKey(1), raw, coords)

        assert denoised.shape == (*cfg.grid_hw, cfg.feat_dim)
        assert np.isfinite(np.asarray(denoised)).all()
        losses = np.asarray(metrics["loss_history"])
        assert losses[-20:].mean() < losses[:20].mean() * 0.25  # optimization works

        raw_full = np.asarray(raw[-1])
        clean_np = np.asarray(clean_full)
        err_raw = np.square(raw_full - clean_np).mean()
        err_den = np.square(np.asarray(denoised) - clean_np).mean()
        # the fit must strip most of the artifact energy
        assert err_den < err_raw * 0.45, (err_den, err_raw)
        assert cos(denoised, clean_full) > cos(jnp.asarray(raw_full), clean_full)

    def test_vmapped_batch_matches_single(self):
        cfg = small_cfg(num_iters=50, warmup_iters=5)
        raws, crds = [], []
        for i in range(2):
            r, c, _, _ = synth_problem(cfg, jax.random.PRNGKey(10 + i))
            raws.append(r)
            crds.append(c)
        raw_b = jnp.stack(raws)
        crd_b = jnp.stack(crds)
        keys = jax.random.split(jax.random.PRNGKey(2), 2)

        den_b, met_b = fit_image_batch(keys, raw_b, crd_b, cfg)
        assert den_b.shape == (2, *cfg.grid_hw, cfg.feat_dim)

        den_0, _ = jax.jit(lambda k, r, c: fit_one_image(k, r, c, cfg))(
            keys[0], raws[0], crds[0]
        )
        np.testing.assert_allclose(
            np.asarray(den_b[0]), np.asarray(den_0), atol=2e-5, rtol=1e-4
        )

    def test_sharded_fit_runs_on_virtual_mesh(self):
        from dvt_tpu.parallel.mesh import make_mesh
        from dvt_tpu.stage1 import fit_image_batch_sharded

        cfg = small_cfg(num_iters=20, warmup_iters=2)
        mesh = make_mesh(data=len(jax.devices()))
        n = mesh.devices.size
        raws, crds = [], []
        for i in range(n):
            r, c, _, _ = synth_problem(cfg, jax.random.PRNGKey(i))
            raws.append(r)
            crds.append(c)
        keys = jax.random.split(jax.random.PRNGKey(3), n)
        den, _ = fit_image_batch_sharded(
            mesh, keys, jnp.stack(raws), jnp.stack(crds), cfg
        )
        assert den.shape == (n, *cfg.grid_hw, cfg.feat_dim)
        assert np.isfinite(np.asarray(den)).all()

    def test_chunked_matches_single_dispatch(self):
        from dvt_tpu.stage1 import fit_image_batch_chunked

        cfg = small_cfg(num_iters=60, warmup_iters=6)
        raws, crds = [], []
        for i in range(2):
            r, c, _, _ = synth_problem(cfg, jax.random.PRNGKey(20 + i))
            raws.append(r)
            crds.append(c)
        raw_b = jnp.stack(raws)
        crd_b = jnp.stack(crds)
        keys = jax.random.split(jax.random.PRNGKey(4), 2)

        den_single, met_single = fit_image_batch(keys, raw_b, crd_b, cfg)
        den_chunk, met_chunk = fit_image_batch_chunked(
            keys, raw_b, crd_b, cfg, chunk_iters=25
        )
        np.testing.assert_allclose(
            np.asarray(den_chunk), np.asarray(den_single), atol=2e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(met_chunk["loss_history"]),
            np.asarray(met_single["loss_history"]),
            atol=1e-5, rtol=1e-4,
        )
