"""Golden-feature parity: our ViT vs timm dumps (when fixtures exist).

Fixtures come from tools/dump_reference_features.py (needs a timm host).
Target: cosine similarity >= 0.999 per patch (BASELINE.md north star).
Skipped when no fixtures are present in tests/golden/.
"""

import glob
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FIXTURES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*__s*.npz")))


@pytest.mark.skipif(not FIXTURES, reason="no golden fixtures dumped")
@pytest.mark.parametrize("path", FIXTURES)
def test_feature_parity_against_timm(path):
    import jax.numpy as jnp

    from dvt_tpu.models.vit import ViTWrapper

    name = os.path.basename(path).split("__s")[0]
    stride = int(os.path.basename(path).split("__s")[1].split(".npz")[0])
    data = np.load(path)
    weights = path.replace(f"__s{stride}.npz", "__weights.pth")
    assert os.path.exists(weights), "weights dump missing"

    wrapper = ViTWrapper(
        name, stride=stride, checkpoint_path=weights, precision="highest"
    )
    x = jnp.asarray(data["pixels"])[None]
    ours = np.asarray(
        wrapper.get_intermediate_layers(x, n=[wrapper.last_layer_index])[-1][0]
    )
    ref = data["feats"]
    assert ours.shape == ref.shape

    a = ours.reshape(-1, ours.shape[-1])
    b = ref.reshape(-1, ref.shape[-1])
    cos = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-8
    )
    assert cos.min() > 0.995, cos.min()
    assert cos.mean() > 0.999, cos.mean()
