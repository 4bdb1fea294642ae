"""Fused-Adam kernel correctness: exact vs the optax reference chain.

The fused optimizer (ops/fused_adam.py) must reproduce the reference's
torch.optim.Adam arithmetic (main_img_denoising.py:48-55): additive L2
weight decay, betas (0.9, 0.99), eps 1e-15, bias-corrected updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dvt_tpu.ops.fused_adam import fused_adam_update, fused_adam_update_xla


def optax_reference(params, m, v, grads, lr, count, wd):
    """The stage-1 optax chain (stage1.make_optimizer) for one step, given
    explicit (m, v, count-1) state."""
    opt = optax.chain(
        optax.add_decayed_weights(wd),
        optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15, eps_root=0.0),
        optax.scale(-lr),
    )
    state = (
        optax.EmptyState(),
        optax.ScaleByAdamState(count=jnp.asarray(count - 1, jnp.int32),
                               mu=m, nu=v),
        optax.EmptyState(),
    )
    updates, new_state = opt.update(grads, state, params)
    return optax.apply_updates(params, updates), new_state[1].mu, new_state[1].nu


@pytest.mark.parametrize("shape", [(37, 16), (1000, 8), (129,)])
@pytest.mark.parametrize("count", [1, 7, 500])
def test_xla_impl_matches_optax(shape, count):
    k = jax.random.PRNGKey(0)
    p = jax.random.normal(k, shape)
    m = jax.random.normal(jax.random.fold_in(k, 1), shape) * 0.1
    v = jnp.abs(jax.random.normal(jax.random.fold_in(k, 2), shape)) * 0.01
    g = jax.random.normal(jax.random.fold_in(k, 3), shape)
    lr, wd = 0.007, 1e-5

    p1, m1, v1 = fused_adam_update_xla(
        p, m, v, g, lr, jnp.asarray(count), wd=wd)
    p2, m2, v2 = optax_reference(p, m, v, g, lr, count, wd)
    np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(m1, m2, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(v1, v2, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("shape", [(300, 8), (64, 128), (100,)])
def test_pallas_kernel_matches_xla(shape):
    k = jax.random.PRNGKey(1)
    p = jax.random.normal(k, shape)
    m = (jax.random.normal(jax.random.fold_in(k, 1), shape) * 0.1)
    v = jnp.abs(jax.random.normal(jax.random.fold_in(k, 2), shape)) * 0.01
    g = jax.random.normal(jax.random.fold_in(k, 3), shape)

    a = fused_adam_update(p, m, v, g, 0.01, jnp.asarray(3), wd=1e-5,
                          interpret=True)
    b = fused_adam_update_xla(p, m, v, g, 0.01, jnp.asarray(3), wd=1e-5)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-7)


def test_pallas_kernel_bf16_moments():
    shape = (200, 16)
    k = jax.random.PRNGKey(2)
    p = jax.random.normal(k, shape)
    m = (jax.random.normal(jax.random.fold_in(k, 1), shape) * 0.1
         ).astype(jnp.bfloat16)
    v = (jnp.abs(jax.random.normal(jax.random.fold_in(k, 2), shape)) * 0.01
         ).astype(jnp.bfloat16)
    g = jax.random.normal(jax.random.fold_in(k, 3), shape)

    a = fused_adam_update(p, m, v, g, 0.01, jnp.asarray(5), interpret=True)
    b = fused_adam_update_xla(p, m, v, g, 0.01, jnp.asarray(5))
    assert a[1].dtype == jnp.bfloat16 and a[2].dtype == jnp.bfloat16
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=1e-5, atol=1e-6)


def test_stage1_fused_matches_optax_fit():
    """End-to-end: a tiny fit with the fused optimizer tracks the optax path.

    Uses the REAL mid-fit freeze point: both impls now implement
    torch-exact freezing (param AND moments untouched - G in phase 2,
    residual predictor in phase 1), so the paths stay equivalent across
    the phase boundary.
    """
    from dvt_tpu.stage1 import Stage1Config, fit_one_image

    base = dict(
        feat_dim=16, noise_map_height=6, noise_map_width=6, n_levels=3,
        num_views=10, num_iters=60, warmup_iters=10, pixel_bsz=64,
        freeze_shared_artifacts_after=0.5, moments_dtype=jnp.float32,
    )
    k = jax.random.PRNGKey(0)
    V, h, w, C = 11, 6, 6, 16
    raw = jax.random.normal(k, (V, h, w, C))
    coords = jax.random.uniform(jax.random.fold_in(k, 1), (V, h, w, 2))

    d1, m1 = fit_one_image(jax.random.PRNGKey(7), raw, coords,
                           Stage1Config(**base, optimizer_impl="fused"))
    d2, m2 = fit_one_image(jax.random.PRNGKey(7), raw, coords,
                           Stage1Config(**base, optimizer_impl="optax"))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(m1["final_loss"]),
                               float(m2["final_loss"]), rtol=1e-3)


def test_stochastic_corners_unbiased():
    """Mean of stochastic-corner encodes over many keys -> exact encode."""
    from dvt_tpu.ops.hash_encoding import (HashGridSpec, hash_encode,
                                           init_hash_table)

    spec = HashGridSpec(n_levels=3, n_features=4, log2_hashmap_size=8,
                        base_resolution=4, max_resolution=16,
                        matmul_level_threshold=0)
    k = jax.random.PRNGKey(0)
    table = jax.random.normal(k, (spec.total_entries, spec.n_features))
    coords = jax.random.uniform(jax.random.fold_in(k, 1), (32, 2))

    exact = hash_encode(table, coords, spec)
    keys = jax.random.split(jax.random.PRNGKey(42), 4000)
    sampled = jax.vmap(lambda kk: hash_encode(table, coords, spec, kk))(keys)
    mean = jnp.mean(sampled, axis=0)
    err = jnp.abs(mean - exact).max()
    scale = jnp.abs(exact).max()
    assert float(err) < 0.08 * float(scale), (float(err), float(scale))


def test_stochastic_corners_fit_converges():
    """A tiny stochastic-corner fit still reaches a sane reconstruction."""
    from dvt_tpu.stage1 import Stage1Config, fit_one_image

    cfg = Stage1Config(
        feat_dim=16, noise_map_height=6, noise_map_width=6, n_levels=3,
        num_views=10, num_iters=300, warmup_iters=30, pixel_bsz=128,
        stochastic_corners=True, matmul_level_threshold=64,
    )
    k = jax.random.PRNGKey(0)
    V, h, w, C = 11, 6, 6, 16
    base = jax.random.normal(k, (1, h, w, C))
    raw = jnp.tile(base, (V, 1, 1, 1))
    coords = jnp.tile(
        jnp.stack(jnp.meshgrid(jnp.linspace(0, 1, w), jnp.linspace(0, 1, h),
                               indexing="xy"), -1)[None], (V, 1, 1, 1))
    denoised, metrics = fit_one_image(jax.random.PRNGKey(3), raw, coords, cfg)
    assert float(metrics["final_recon_cos"]) > 0.9


@pytest.mark.parametrize("impl,sweep", [("fused", 1), ("optax", 1),
                                        ("fused", 4)])
def test_phase_freeze_torch_semantics(impl, sweep):
    """Torch parameter-participation parity (main_img_denoising.py:70-72):

    * phase 1 leaves the residual predictor EXACTLY at init - its grads
      are identically zero and torch Adam SKIPS None-grad params, so
      additive wd must not sign-decay the init;
    * phase 2 leaves shared_artifacts EXACTLY at its freeze-point value.

    Covers both optimizer impls and the deferred-sweep path (K=4)."""
    from dvt_tpu.stage1 import Stage1Config, fit_one_image, init_fit

    base = dict(
        feat_dim=8, noise_map_height=5, noise_map_width=5, n_levels=3,
        num_views=6, num_iters=40, warmup_iters=4, pixel_bsz=32,
        moments_dtype=jnp.float32, optimizer_impl=impl,
        table_sweep_every=sweep,
    )
    k = jax.random.PRNGKey(3)
    V, h, w, C = 7, 5, 5, 8
    raw = jax.random.normal(k, (V, h, w, C))
    coords = jax.random.uniform(jax.random.fold_in(k, 1), (V, h, w, 2))
    fit_key = jax.random.PRNGKey(11)

    # all-phase-1 run: residual init preserved bit-exactly, G trains
    cfg1 = Stage1Config(**base, freeze_shared_artifacts_after=2.0)
    init_params, _ = init_fit(jax.random.split(fit_key)[0], cfg1)
    _, _, p1 = fit_one_image(fit_key, raw, coords, cfg1,
                             return_params=True)
    for leaf in ("res_0", "res_2", "res_4"):
        for name in ("kernel", "bias"):
            np.testing.assert_array_equal(
                np.asarray(p1["denoiser"][leaf][name]),
                np.asarray(init_params["denoiser"][leaf][name]))
    assert not np.allclose(np.asarray(p1["denoiser"]["shared_artifacts"]),
                           np.asarray(init_params["denoiser"]
                                      ["shared_artifacts"]))

    # phase 2 from step 1: G frozen after its single step-0 update
    # (step 0 is phase 1: the reference's flip is strict step > 0)
    cfg2 = Stage1Config(**base, freeze_shared_artifacts_after=0.0)
    cfg2_one = Stage1Config(**{**base, "num_iters": sweep},
                            freeze_shared_artifacts_after=0.0)
    _, _, p_full = fit_one_image(fit_key, raw, coords, cfg2,
                                 return_params=True)
    _, _, p_one = fit_one_image(fit_key, raw, coords, cfg2_one,
                                return_params=True)
    np.testing.assert_array_equal(
        np.asarray(p_full["denoiser"]["shared_artifacts"]),
        np.asarray(p_one["denoiser"]["shared_artifacts"]))
    # and the residual predictor DID train in phase 2
    assert not np.array_equal(np.asarray(p_full["denoiser"]["res_0"]["kernel"]),
                              np.asarray(init_params["denoiser"]["res_0"]["kernel"]))
