"""Golden-feature parity: our ViT vs timm dumps (when fixtures exist).

Fixtures come from tools/dump_reference_features.py (needs a timm host).
Target: cosine similarity >= 0.999 per patch (BASELINE.md north star).
The real-weight cases skip when no fixtures are present in tests/golden/ -
but the CONSUMPTION path (filename parse -> .pth weight load through
models.convert -> forward -> cosine assertion) always executes via a
fabricated fixture produced by the torch oracle (VERDICT r3 #4: no
never-executed test paths; the real fixtures then only change the data).
"""

import glob
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FIXTURES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*__s*.npz")))


def check_fixture(path, min_cos=0.995, mean_cos=0.999):
    """The golden consumption path: <name>__s<stride>.npz + matching
    <name>__weights.pth -> ViTWrapper(checkpoint_path=...) forward on the
    dumped pixels -> per-patch cosine vs the dumped feature map."""
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
    assert cos.min() > min_cos, cos.min()
    assert cos.mean() > mean_cos, cos.mean()


@pytest.mark.skipif(not FIXTURES, reason="no golden fixtures dumped")
@pytest.mark.parametrize("path", FIXTURES)
def test_feature_parity_against_timm(path):
    check_fixture(path)


def test_fabricated_fixture_exercises_consumption_path(tmp_path):
    """Fabricate a golden fixture with the independent TORCH oracle (the
    same timm forward semantics tools/dump_reference_features.py dumps):
    random timm-layout weights -> torch.save .pth + oracle feature .npz,
    then run the EXACT check_fixture path on it. This is a real mini
    golden test - the weights flow through models.convert and the cosine
    must clear the same thresholds the real fixtures use."""
    import torch

    from test_vit import make_torch_state_dict, tiny_cfg, torch_vit_forward

    from dvt_tpu.models.zoo import register_model

    cfg = tiny_cfg(name="vit_golden_fab.test", init_values=1e-1)
    register_model(cfg)
    sd = make_torch_state_dict(cfg, seed=3)

    stride = 4
    x = torch.randn(1, 3, 32, 32, generator=torch.Generator().manual_seed(9))
    feats = torch_vit_forward(sd, cfg, x, stride, [cfg.depth - 1])[-1][0]

    name = "vit_golden_fab.test"
    np.savez(tmp_path / f"{name}__s{stride}.npz",
             pixels=x[0].permute(1, 2, 0).numpy(), feats=feats)
    torch.save(sd, tmp_path / f"{name}__weights.pth")

    check_fixture(str(tmp_path / f"{name}__s{stride}.npz"))
