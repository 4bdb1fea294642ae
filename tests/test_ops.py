"""Numerical tests for core ops, using torch (CPU) as the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dvt_tpu.ops import (
    HashGridSpec,
    grid_sample_2d,
    hash_encode,
    init_hash_table,
    resample_abs_pos_embed,
)


class TestGridSample:
    @pytest.mark.parametrize("align_corners", [True, False])
    def test_matches_torch(self, rng, align_corners):
        h, w, c = 37, 37, 16
        img = rng.standard_normal((h, w, c)).astype(np.float32)
        coords = rng.uniform(-1, 1, size=(500, 2)).astype(np.float32)

        ours = grid_sample_2d(jnp.asarray(img), jnp.asarray(coords), align_corners)

        t_img = torch.from_numpy(img).permute(2, 0, 1)[None]  # (1,C,H,W)
        t_coords = torch.from_numpy(coords)[None, None]  # (1,1,N,2)
        ref = F.grid_sample(
            t_img, t_coords, mode="bilinear", align_corners=align_corners
        )
        ref = ref[0, :, 0].T.numpy()  # (N,C)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_exact_grid_points_are_identity(self, rng):
        # The stage-1 fit samples the artifact map exactly at its own grid
        # points (main_img_denoising.py:59-64); bilinear must be exact there.
        h = w = 9
        img = rng.standard_normal((h, w, 4)).astype(np.float32)
        ys, xs = np.meshgrid(
            np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
        )
        coords = np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.float32)
        out = grid_sample_2d(jnp.asarray(img), jnp.asarray(coords), True)
        np.testing.assert_allclose(
            np.asarray(out), img.reshape(-1, 4), atol=1e-5
        )


class TestResamplePosEmbed:
    @pytest.mark.parametrize("num_prefix", [0, 1, 5])
    def test_matches_torch_bicubic(self, rng, num_prefix):
        old, new, c = (16, 16), (37, 37), 32
        pe = rng.standard_normal((1, num_prefix + old[0] * old[1], c)).astype(
            np.float32
        )
        ours = resample_abs_pos_embed(
            jnp.asarray(pe), new, old, num_prefix_tokens=num_prefix
        )

        grid = torch.from_numpy(pe[:, num_prefix:]).reshape(1, *old, c)
        grid = grid.permute(0, 3, 1, 2)
        grid = F.interpolate(
            grid, size=new, mode="bicubic", antialias=True, align_corners=False
        )
        grid = grid.permute(0, 2, 3, 1).reshape(1, -1, c).numpy()
        ref = np.concatenate([pe[:, :num_prefix], grid], axis=1)

        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)

    @pytest.mark.parametrize("sizes", [((37, 37), (16, 16)), ((7, 9), (21, 5))])
    def test_downsample_antialias_matches_torch(self, rng, sizes):
        old, new = sizes
        c = 8
        pe = rng.standard_normal((1, old[0] * old[1], c)).astype(np.float32)
        ours = resample_abs_pos_embed(jnp.asarray(pe), new, old, 0)
        grid = torch.from_numpy(pe).reshape(1, *old, c).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, size=new, mode="bicubic", antialias=True)
        ref = grid.permute(0, 2, 3, 1).reshape(1, -1, c).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)

    def test_identity_when_same_size(self, rng):
        pe = rng.standard_normal((1, 1 + 49, 8)).astype(np.float32)
        out = resample_abs_pos_embed(jnp.asarray(pe), (7, 7), (7, 7))
        np.testing.assert_array_equal(np.asarray(out), pe)


def _numpy_hash_encode(table, coords, spec):
    """Independent NumPy oracle for the hash encoding."""
    out = np.zeros((coords.shape[0], spec.n_output_dims), np.float32)
    for l, (res, size, off) in enumerate(
        zip(spec.resolutions, spec.level_sizes, spec.level_offsets)
    ):
        pos = coords * res
        p0 = np.floor(pos).astype(np.int64)
        frac = pos - p0
        for dx in (0, 1):
            for dy in (0, 1):
                cx = np.clip(p0[:, 0] + dx, 0, res)
                cy = np.clip(p0[:, 1] + dy, 0, res)
                if (res + 1) ** 2 <= size:
                    idx = cy * (res + 1) + cx
                else:
                    idx = (
                        cx.astype(np.uint64) ^ (cy.astype(np.uint64) * 2654435761)
                    ) % size
                wx = frac[:, 0] if dx else 1 - frac[:, 0]
                wy = frac[:, 1] if dy else 1 - frac[:, 1]
                f = table[off + idx.astype(np.int64)]
                sl = slice(l * spec.n_features, (l + 1) * spec.n_features)
                out[:, sl] += f * (wx * wy)[:, None]
    return out


class TestHashEncoding:
    def test_spec_geometry(self):
        spec = HashGridSpec()
        assert spec.n_output_dims == 128
        assert spec.resolutions[0] == 16
        assert spec.resolutions[-1] in (1023, 1024)
        # coarse levels dense, fine levels hashed at 2^20
        assert spec.level_sizes[0] == 17 * 17
        assert spec.level_sizes[-1] == 1 << 20

    def test_matches_numpy_oracle(self, rng):
        spec = HashGridSpec(n_levels=6, base_resolution=4, max_resolution=64,
                            log2_hashmap_size=8, n_features=4)
        table = rng.standard_normal(
            (spec.total_entries, spec.n_features)
        ).astype(np.float32)
        coords = rng.uniform(0, 1, size=(200, 2)).astype(np.float32)
        coords[:5] = [[0, 0], [1, 1], [1, 0], [0, 1], [0.5, 0.5]]

        ours = hash_encode(jnp.asarray(table), jnp.asarray(coords), spec)
        ref = _numpy_hash_encode(table, coords, spec)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_grad_flows_to_table(self, rng):
        spec = HashGridSpec(n_levels=4, base_resolution=4, max_resolution=32,
                            log2_hashmap_size=6, n_features=2)
        key = jax.random.PRNGKey(0)
        table = init_hash_table(key, spec)
        coords = jnp.asarray(rng.uniform(0, 1, size=(64, 2)), jnp.float32)

        def loss(t):
            return jnp.sum(hash_encode(t, coords, spec) ** 2)

        g = jax.grad(loss)(table)
        assert g.shape == table.shape
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_vmap_over_tables(self, rng):
        spec = HashGridSpec(n_levels=3, base_resolution=4, max_resolution=16,
                            log2_hashmap_size=6, n_features=2)
        tables = jnp.asarray(
            rng.standard_normal((5, spec.total_entries, spec.n_features)),
            jnp.float32,
        )
        coords = jnp.asarray(rng.uniform(0, 1, size=(5, 32, 2)), jnp.float32)
        out = jax.vmap(lambda t, c: hash_encode(t, c, spec))(tables, coords)
        assert out.shape == (5, 32, spec.n_output_dims)
        ref0 = hash_encode(tables[0], coords[0], spec)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0), atol=1e-6)

    def test_flat_vmap_gather_scatter_match_default_batching(self, rng):
        # gather_rows/scatter_add_rows flatten the image batch into the row
        # dim under vmap (the stage-1 N-fits-per-chip lowering); every
        # batching combo must equal XLA's default operand-batch-dim rule.
        from dvt_tpu.ops.hash_encoding import gather_rows, scatter_add_rows

        k = jax.random.PRNGKey(0)
        t = jax.random.normal(k, (3, 64, 8))
        i4 = jax.random.randint(jax.random.fold_in(k, 1),
                                (3, 10, 2, 4), 0, 64)
        si = jax.random.randint(jax.random.fold_in(k, 2), (3, 20), 0, 64)
        v = jax.random.normal(jax.random.fold_in(k, 3), (3, 20, 8))

        plain_g = lambda tt, ii: jnp.take(tt, ii, axis=0)
        plain_s = lambda aa, ii, vv: aa.at[ii].add(vv)
        cases = [
            (jax.vmap(gather_rows)(t, i4),
             jax.vmap(plain_g)(t, i4)),
            (jax.vmap(gather_rows, in_axes=(None, 0))(t[0], i4),
             jax.vmap(plain_g, in_axes=(None, 0))(t[0], i4)),
            (jax.vmap(gather_rows, in_axes=(0, None))(t, i4[0]),
             jax.vmap(plain_g, in_axes=(0, None))(t, i4[0])),
            (jax.vmap(scatter_add_rows)(t, si, v),
             jax.vmap(plain_s)(t, si, v)),
            (jax.vmap(scatter_add_rows, in_axes=(0, None, 0))(t, si[0], v),
             jax.vmap(plain_s, in_axes=(0, None, 0))(t, si[0], v)),
            (jax.vmap(scatter_add_rows, in_axes=(None, 0, 0))(t[0], si, v),
             jax.vmap(plain_s, in_axes=(None, 0, 0))(t[0], si, v)),
            (gather_rows(t[0], si[0]), plain_g(t[0], si[0])),
        ]
        for got, want in cases:
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        # composes under jit(vmap(scan(.)))
        def body(c, _):
            return scatter_add_rows(c, si[0], v[0]), None

        out = jax.jit(jax.vmap(
            lambda a: jax.lax.scan(body, a, None, length=3)[0]
        ))(t)
        ref = jax.jit(jax.vmap(
            lambda a: jax.lax.scan(
                lambda c, _: (plain_s(c, si[0], v[0]), None), a, None,
                length=3)[0]
        ))(t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6)

    def test_interpolation_is_continuous(self, rng):
        spec = HashGridSpec(n_levels=4, base_resolution=4, max_resolution=32,
                            log2_hashmap_size=10, n_features=2)
        table = jnp.asarray(
            rng.standard_normal((spec.total_entries, spec.n_features)),
            jnp.float32,
        )
        c0 = jnp.array([[0.37, 0.61]])
        c1 = c0 + 1e-5
        f0 = hash_encode(table, c0, spec)
        f1 = hash_encode(table, c1, spec)
        assert float(jnp.abs(f1 - f0).max()) < 1e-2

    def test_matmul_path_matches_gather_path(self, rng):
        base = dict(n_levels=6, base_resolution=4, max_resolution=64,
                    log2_hashmap_size=8, n_features=4)
        spec_mm = HashGridSpec(**base, matmul_level_threshold=4096)
        spec_g = HashGridSpec(**base, matmul_level_threshold=0)
        table = jnp.asarray(
            rng.standard_normal((spec_mm.total_entries, 4)), jnp.float32
        )
        coords = jnp.asarray(rng.uniform(0, 1, size=(100, 2)), jnp.float32)

        out_mm = hash_encode(table, coords, spec_mm)
        out_g = hash_encode(table, coords, spec_g)
        np.testing.assert_allclose(
            np.asarray(out_mm), np.asarray(out_g), atol=1e-5, rtol=1e-5
        )

        def loss(t, spec):
            return jnp.sum(hash_encode(t, coords, spec) ** 2)

        g_mm = jax.grad(lambda t: loss(t, spec_mm))(table)
        g_g = jax.grad(lambda t: loss(t, spec_g))(table)
        np.testing.assert_allclose(
            np.asarray(g_mm), np.asarray(g_g), atol=1e-4, rtol=1e-4
        )

    @pytest.mark.parametrize("stochastic", [False, True])
    def test_split_encode_composes_to_hash_encode(self, rng, stochastic):
        """hash_plan + hash_gather_rows + hash_encode_from == hash_encode,
        for the value AND the table gradient (exact and stochastic-corner
        modes, same corner_key -> bit-identical corner draws)."""
        from dvt_tpu.ops.hash_encoding import (
            hash_encode_from,
            hash_gather_rows,
            hash_plan,
        )

        spec = HashGridSpec(n_levels=6, base_resolution=4, max_resolution=64,
                            log2_hashmap_size=8, n_features=4,
                            matmul_level_threshold=100)
        assert 0 < spec.coarse_entries < spec.total_entries
        table = jnp.asarray(
            rng.standard_normal((spec.padded_entries, 4)), jnp.float32
        )
        coords = jnp.asarray(rng.uniform(0, 1, size=(64, 2)), jnp.float32)
        ckey = jax.random.PRNGKey(11) if stochastic else None

        ref = hash_encode(table, coords, spec, ckey)

        plan = hash_plan(coords, spec, ckey)
        rows = hash_gather_rows(table, plan)
        out = hash_encode_from(table[: spec.coarse_entries], rows, plan, spec,
                               batch_shape=(64,))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

        # table gradient: dense reference vs (prefix grad + scattered rows)
        g_ref = jax.grad(
            lambda t: jnp.sum(hash_encode(t, coords, spec, ckey) ** 2)
        )(table)

        def split_loss(cp, fr):
            return jnp.sum(hash_encode_from(cp, fr, plan, spec,
                                            batch_shape=(64,)) ** 2)

        g_cp, g_fr = jax.grad(split_loss, argnums=(0, 1))(
            table[: spec.coarse_entries], rows
        )
        g_split = jnp.zeros_like(table)
        g_split = g_split.at[: spec.coarse_entries].add(g_cp)
        g_split = g_split.at[plan["fine_idx"].reshape(-1)].add(
            g_fr.reshape(-1, spec.n_features)
        )
        np.testing.assert_allclose(np.asarray(g_split), np.asarray(g_ref),
                                   atol=1e-5, rtol=1e-5)

    def test_level_subsample_full_keep_is_exact(self, rng):
        """subsample_fine_levels with keep == Lg is a permutation that
        hash_encode_from scatters back: value identical to the full path
        (scale Lg/keep == 1)."""
        from dvt_tpu.ops.hash_encoding import (
            hash_encode_from,
            hash_gather_rows,
            hash_plan,
            subsample_fine_levels,
        )

        spec = HashGridSpec(n_levels=6, base_resolution=4, max_resolution=64,
                            log2_hashmap_size=8, n_features=4,
                            matmul_level_threshold=100)
        table = jnp.asarray(
            rng.standard_normal((spec.padded_entries, 4)), jnp.float32
        )
        coords = jnp.asarray(rng.uniform(0, 1, size=(32, 2)), jnp.float32)
        ref = hash_encode(table, coords, spec, None)

        plan = hash_plan(coords, spec, None)
        lg = plan["fine_idx"].shape[1]
        sub = subsample_fine_levels(plan, jax.random.PRNGKey(3), lg)
        rows = hash_gather_rows(table, sub)
        out = hash_encode_from(table[: spec.coarse_entries], rows, sub, spec,
                               batch_shape=(32,))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

    def test_level_subsample_partial_zeros_and_scales(self, rng):
        """keep < Lg: sampled level slots carry Lg/keep-scaled features,
        unsampled slots are exactly zero, coarse levels untouched."""
        from dvt_tpu.ops.hash_encoding import (
            hash_encode_from,
            hash_gather_rows,
            hash_plan,
            subsample_fine_levels,
        )

        spec = HashGridSpec(n_levels=6, base_resolution=4, max_resolution=64,
                            log2_hashmap_size=8, n_features=4,
                            matmul_level_threshold=100)
        table = jnp.asarray(
            rng.standard_normal((spec.padded_entries, 4)), jnp.float32
        )
        coords = jnp.asarray(rng.uniform(0, 1, size=(32, 2)), jnp.float32)
        full = np.asarray(
            hash_encode(table, coords, spec, None)
        ).reshape(32, spec.n_levels, 4)

        plan = hash_plan(coords, spec, None)
        lg = plan["fine_idx"].shape[1]
        keep = lg - 1
        sub = subsample_fine_levels(plan, jax.random.PRNGKey(5), keep)
        rows = hash_gather_rows(table, sub)
        assert rows.shape[1] == keep  # the gather actually shrank
        out = np.asarray(
            hash_encode_from(table[: spec.coarse_entries], rows, sub, spec,
                             batch_shape=(32,))
        ).reshape(32, spec.n_levels, 4)

        n_coarse = spec.n_levels - lg
        np.testing.assert_allclose(out[:, :n_coarse], full[:, :n_coarse],
                                   atol=1e-6)
        perm = set(np.asarray(sub["fine_perm"]).tolist())
        for k in range(lg):
            lvl = n_coarse + k
            if k in perm:
                np.testing.assert_allclose(
                    out[:, lvl], full[:, lvl] * (lg / keep), atol=1e-5)
            else:
                assert np.all(out[:, lvl] == 0)
