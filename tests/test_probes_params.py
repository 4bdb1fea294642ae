"""Probes with explicit feature params (the jit-argument path) and the
ViT+denoiser DenoisingPipeline composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvt_tpu.eval.glue import make_feature_fn
from dvt_tpu.eval.seg import SegLinearProbe
from dvt_tpu.models.online_denoiser import Denoiser, DenoisingPipeline
from dvt_tpu.models.vit import ViTWrapper
from dvt_tpu.models.zoo import ViTConfig, register_model

register_model(
    ViTConfig(
        name="vit_probe_tiny_patch8_32.test",
        embed_dim=32,
        depth=1,
        num_heads=2,
        patch_size=8,
        pretrain_img_size=32,
    )
)


@pytest.fixture(scope="module")
def wrapper():
    return ViTWrapper("vit_probe_tiny_patch8_32.test", stride=8, seed=0)


def test_feature_fn_with_params_and_probe(wrapper):
    fn, fparams = make_feature_fn(wrapper, pad_multiple=8)
    x = jnp.zeros((2, 30, 30, 3))  # pad -> 32x32 -> 4x4 grid
    feats = fn(fparams, x)
    assert feats.shape == (2, 4, 4, 32)

    probe = SegLinearProbe(fn, num_classes=3, feature_params=fparams,
                           lr=1e-2, total_iters=5, warmup_iters=1)
    state = probe.init_state(x)
    state, m = probe.train_step(
        state, x, jnp.zeros((2, 30, 30), jnp.int32)
    )
    assert np.isfinite(float(m["loss"]))
    logits = probe.predict_logits(state, x)
    assert logits.shape == (2, 30, 30, 3)


def test_denoising_pipeline_composition(wrapper):
    dn = Denoiser(noise_map_height=4, noise_map_width=4, feat_dim=32)
    dp = dn.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 32)))["params"]
    pipe = DenoisingPipeline(vit=wrapper, denoiser=dn, denoiser_params=dp)
    x = jnp.zeros((2, 32, 32, 3))
    out = pipe(x)
    assert out.shape == (2, 4, 4, 32)
    den, cls = pipe.with_class_token(x)
    assert den.shape == (2, 4, 4, 32)
    assert cls.shape == (2, 32)
