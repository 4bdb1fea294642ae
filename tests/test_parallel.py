"""Mesh + sharding-rule tests on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dvt_tpu.models.vit import VisionTransformer
from dvt_tpu.models.zoo import ViTConfig
from dvt_tpu.parallel.mesh import data_sharding, make_mesh, shard_batch
from dvt_tpu.parallel.sharding import shard_params, vit_param_spec


class TestMesh:
    def test_shapes(self):
        mesh = make_mesh()
        assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
        mesh2 = make_mesh(data=4, model=2)
        assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
        with pytest.raises(ValueError):
            make_mesh(data=16, model=1)

    def test_shard_batch_places_leading_axis(self):
        mesh = make_mesh()
        batch = {"x": np.zeros((16, 3), np.float32)}
        out = shard_batch(mesh, batch)
        sh = out["x"].sharding
        assert sh.spec == P("data", None) or sh.spec == P("data")


class TestShardingRules:
    def _params(self):
        cfg = ViTConfig(name="t", embed_dim=64, depth=1, num_heads=2,
                        patch_size=8, pretrain_img_size=32)
        model = VisionTransformer(cfg, stride=8)
        return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))[
            "params"
        ]

    def test_tp_specs(self):
        params = self._params()
        specs = {}

        def record(path, leaf):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            specs[name] = vit_param_spec(path, leaf)
            return leaf

        jax.tree_util.tree_map_with_path(record, params)
        assert specs["blocks_0/attn/qkv/kernel"] == P(None, "model")
        assert specs["blocks_0/attn/proj/kernel"] == P("model", None)
        assert specs["blocks_0/mlp/fc1/kernel"] == P(None, "model")
        assert specs["blocks_0/mlp/fc2/kernel"] == P("model", None)
        assert specs["pos_embed"] == P()
        assert specs["blocks_0/norm1/scale"] == P()

    def test_tp_forward_matches_replicated(self):
        """TP-sharded params must produce the same forward as replicated."""
        cfg = ViTConfig(name="t", embed_dim=64, depth=1, num_heads=2,
                        patch_size=8, pretrain_img_size=32)
        model = VisionTransformer(cfg, stride=8)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        ref = model.apply({"params": params}, x)[0]

        mesh = make_mesh(data=4, model=2)
        sharded = shard_params(mesh, params, tensor_parallel=True)
        xs = jax.device_put(x, data_sharding(mesh, 4))
        out = jax.jit(lambda p, x: model.apply({"params": p}, x)[0])(
            sharded, xs
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


class TestDonationGate:
    def test_env_override(self, monkeypatch):
        from dvt_tpu.parallel.mesh import safe_donate_argnums

        monkeypatch.setenv("DVT_DONATE", "1")
        assert safe_donate_argnums(0, 2) == (0, 2)
        monkeypatch.setenv("DVT_DONATE", "0")
        assert safe_donate_argnums(0) == ()
        monkeypatch.setenv("DVT_DONATE", "auto")
        # CPU backend (tests) is not axon -> donation stays on
        assert safe_donate_argnums(0) == (0,)
