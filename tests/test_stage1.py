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
    def test_shared_at_unit_coords_hit_grid_points(self):
        """shared_at takes [0,1] coords (the range the data pipeline
        stores); sampling the artifact map's own grid coordinates must
        reproduce its values exactly (align_corners=True semantics)."""
        from dvt_tpu.models.offline_denoiser import SingleImageDenoiser

        h, w, c = 5, 7, 3
        d = SingleImageDenoiser(feat_dim=c, noise_map_height=h,
                                noise_map_width=w,
                                enable_residual_predictor=False)
        params = d.init(jax.random.PRNGKey(0),
                        jnp.zeros((h * w, c)), jnp.zeros((h * w, c)))
        g = params["params"]["shared_artifacts"]
        ys, xs = jnp.meshgrid(jnp.linspace(0, 1, h), jnp.linspace(0, 1, w),
                              indexing="ij")
        coords = jnp.stack([xs, ys], -1).reshape(-1, 2)  # (x, y) like torch
        sampled = d.apply(params, coords,
                          method=lambda m, cc: m.shared_at(cc))
        np.testing.assert_allclose(
            np.asarray(sampled), np.asarray(g).reshape(-1, c),
            atol=1e-5, rtol=1e-5)

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


class TestDeferredTableSweep:
    """table_sweep_every: K-step deferred hash-table Adam (stage1.py)."""

    def _run(self, cfg, n_iters, key=7):
        from dvt_tpu.stage1 import _scan_single, init_fit

        raw, coords, clean_full, _ = synth_problem(cfg, jax.random.PRNGKey(0))
        params, opt_state = init_fit(jax.random.PRNGKey(key), cfg)
        raw_flat = raw.reshape(cfg.pool_size, cfg.feat_dim)
        crd_flat = coords.reshape(cfg.pool_size, 2).astype(jnp.float32)
        run = jax.jit(
            lambda p, o: _scan_single(
                jax.random.PRNGKey(key + 1), p, o, raw_flat, crd_flat, cfg,
                jnp.zeros((), jnp.int32), n_iters,
            )
        )
        return run(params, opt_state), clean_full

    @pytest.mark.parametrize("stochastic", [False, True])
    def test_k1_matches_standard_fused_path(self, stochastic):
        """K=1 deferred == the standard fused scan (same grads, same Adam)."""
        from dvt_tpu.stage1 import _scan_deferred, init_fit

        cfg1 = small_cfg(num_iters=24, warmup_iters=4, pixel_bsz=64,
                         stochastic_corners=stochastic)
        raw, coords, _, _ = synth_problem(cfg1, jax.random.PRNGKey(0))
        params, opt_state = init_fit(jax.random.PRNGKey(7), cfg1)
        raw_flat = raw.reshape(cfg1.pool_size, cfg1.feat_dim)
        crd_flat = coords.reshape(cfg1.pool_size, 2).astype(jnp.float32)

        from dvt_tpu.stage1 import _scan_single

        p_std, _, m_std = jax.jit(
            lambda p, o: _scan_single(
                jax.random.PRNGKey(8), p, o, raw_flat, crd_flat, cfg1,
                jnp.zeros((), jnp.int32), 24)
        )(params, opt_state)

        cfg_def = dataclass_replace(cfg1, table_sweep_every=1)
        p_def, _, m_def = jax.jit(
            lambda p, o: _scan_deferred(
                jax.random.PRNGKey(8), p, o, raw_flat, crd_flat, cfg_def,
                jnp.zeros((), jnp.int32), 24)
        )(params, opt_state)

        np.testing.assert_allclose(
            np.asarray(m_def["loss"]), np.asarray(m_std["loss"]),
            atol=1e-6, rtol=1e-5,
        )
        for path in [("field", "table"), ("field", "mlp_0", "kernel"),
                     ("denoiser", "shared_artifacts")]:
            a, b = p_def, p_std
            for k in path:
                a, b = a[k], b[k]
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-4,
                err_msg=str(path),
            )

    def test_k4_converges_like_standard(self):
        """K=4 deferred sweeps reach comparable fit quality (lr scale K)."""
        cfg_std = small_cfg()
        (_, _, m_std), clean_full = self._run(cfg_std, cfg_std.num_iters)

        cfg_k4 = small_cfg(table_sweep_every=4)
        (p_k4, _, m_k4), _ = self._run(cfg_k4, cfg_k4.num_iters)

        from dvt_tpu.stage1 import _export_single

        raw, coords, clean_full, _ = synth_problem(
            cfg_k4, jax.random.PRNGKey(0)
        )
        den_k4, _ = _export_single(p_k4, raw, cfg_k4)
        l_std = np.asarray(m_std["loss"])[-20:].mean()
        l_k4 = np.asarray(m_k4["loss"])[-20:].mean()
        assert l_k4 < l_std * 1.6, (l_k4, l_std)
        # still strips the artifact
        err_raw = np.square(np.asarray(raw[-1]) - np.asarray(clean_full)).mean()
        err_den = np.square(np.asarray(den_k4) - np.asarray(clean_full)).mean()
        assert err_den < err_raw * 0.5, (err_den, err_raw)

    def test_level_sample_converges_like_standard(self):
        """Level dropout (keep Lg-1 of the gather levels per step) still
        fits the field and strips the artifact; export uses all levels."""
        from dvt_tpu.models.neural_field import default_hash_spec
        from dvt_tpu.stage1 import _export_single

        cfg_std = small_cfg()
        (_, _, m_std), _ = self._run(cfg_std, cfg_std.num_iters)

        spec = default_hash_spec(cfg_std.n_levels,
                                 cfg_std.matmul_level_threshold)
        lg = sum(1 for s in spec.level_sizes
                 if s > cfg_std.matmul_level_threshold)
        assert lg >= 2
        cfg_ls = small_cfg(level_sample=lg - 1, table_sweep_every=2)
        (p_ls, _, m_ls), _ = self._run(cfg_ls, cfg_ls.num_iters)

        raw, coords, clean_full, _ = synth_problem(
            cfg_ls, jax.random.PRNGKey(0)
        )
        den_ls, _ = _export_single(p_ls, raw, cfg_ls)
        l_std = np.asarray(m_std["loss"])[-20:].mean()
        l_ls = np.asarray(m_ls["loss"])[-20:].mean()
        assert l_ls < l_std * 1.8, (l_ls, l_std)
        err_raw = np.square(np.asarray(raw[-1]) - np.asarray(clean_full)).mean()
        err_den = np.square(np.asarray(den_ls) - np.asarray(clean_full)).mean()
        assert err_den < err_raw * 0.5, (err_den, err_raw)

    def test_chunked_k_matches_monolithic(self):
        """Chunk boundaries aligned to K keep the deferred fit bit-stable."""
        from dvt_tpu.stage1 import fit_image_batch, fit_image_batch_chunked

        cfg = small_cfg(num_iters=48, warmup_iters=6, pixel_bsz=64,
                        table_sweep_every=4)
        raw, coords, _, _ = synth_problem(cfg, jax.random.PRNGKey(3))
        keys = jax.random.split(jax.random.PRNGKey(5), 1)
        raw_b, crd_b = raw[None], coords[None]
        den_a, _ = fit_image_batch(keys, raw_b, crd_b, cfg)
        den_b, _ = fit_image_batch_chunked(keys, raw_b, crd_b, cfg,
                                           chunk_iters=16)
        np.testing.assert_allclose(
            np.asarray(den_a), np.asarray(den_b), atol=2e-5, rtol=1e-4
        )

    def test_rejects_misaligned_length(self):
        from dvt_tpu.stage1 import _scan_deferred, init_fit

        cfg = small_cfg(num_iters=10, table_sweep_every=4, pixel_bsz=32)
        raw, coords, _, _ = synth_problem(cfg, jax.random.PRNGKey(0))
        params, opt_state = init_fit(jax.random.PRNGKey(1), cfg)
        with pytest.raises(ValueError, match="divisible"):
            _scan_deferred(
                jax.random.PRNGKey(2), params, opt_state,
                raw.reshape(cfg.pool_size, cfg.feat_dim),
                coords.reshape(cfg.pool_size, 2), cfg,
                jnp.zeros((), jnp.int32), 10,
            )


def dataclass_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)
