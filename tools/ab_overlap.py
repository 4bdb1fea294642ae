"""End-to-end stage-2 A/B: host loader + device train step overlap.

RESULTS.md §2 measured stage-2 at 2.2 s/step loader-bound on the 1-core
host. Two levers are measured here on the SAME synthetic fixture
(reference on-disk contract, 37x37x768 fp32 features, 640x480 JPEGs):

  arm "images"    — include_image=True (reference semantics: every batch
                    decodes + resizes its JPEGs even though the train
                    step only consumes the feature pair,
                    main_denoiser.py:205-217 upstream)
  arm "featonly"  — include_image=False (our default in main_denoiser):
                    the loader reads ONLY the two .npy features per
                    sample; vis steps fetch their few images on demand
                    via image_for_index()

Each arm measures (a) loader-only batches/s (native C++ get_batch through
the DataLoader's prefetch thread) and (b) end-to-end steps/s feeding a
real Stage2Trainer.train_step, so the report shows how much of the step
is hidden by prefetch overlap.

Usage: python tools/ab_overlap.py           (device; probe TPU first)
       DVT_PLATFORM=cpu python tools/ab_overlap.py
Env: AO_IMAGES (default 32), AO_BATCH (8), AO_STEPS (12), AO_SIZE (518).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

from ab_loader import build_fixture  # same fixture contract


def loader_only_rate(loader, n_batches: int) -> float:
    it = iter(loader)
    next(it)  # warm: native lib load, feat-shape probe, file cache
    t0 = time.time()
    for _ in range(n_batches):
        next(it)
    dt = (time.time() - t0) / n_batches
    it.close()
    return dt


def e2e_rate(loader, trainer, n_steps: int) -> float:
    import jax

    def sync(m):
        np.asarray(jax.device_get(m["loss"]).ravel()[0])

    it = iter(loader)
    b = next(it)
    m = trainer.train_step(b["original_feats"], b["denoised_feats"])
    sync(m)  # compile + warm
    t0 = time.time()
    for _ in range(n_steps):
        b = next(it)
        m = trainer.train_step(b["original_feats"], b["denoised_feats"])
        # host-sync EVERY step: the loss read is what the real training
        # loop does (NaN guard) and it prevents the dispatch queue from
        # hiding loader stalls
        sync(m)
    dt = (time.time() - t0) / n_steps
    it.close()
    return dt


def main():
    from dvt_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax

    from dvt_tpu.data.paired_list import PairedListDataset
    from dvt_tpu.data.prefetch import DataLoader
    from dvt_tpu.data.samplers import DistributedInfiniteSampler
    from dvt_tpu.parallel.mesh import make_mesh, shard_batch
    from dvt_tpu.stage2 import Stage2Config, Stage2Trainer

    n = int(os.environ.get("AO_IMAGES", "32"))
    bs = int(os.environ.get("AO_BATCH", "8"))
    steps = int(os.environ.get("AO_STEPS", "12"))
    size = int(os.environ.get("AO_SIZE", "518"))
    gh = (size - 14) // 14 + 1
    root = "/tmp/dvt_ab_overlap"
    shutil.rmtree(root, ignore_errors=True)
    lst, den_dir = build_fixture(root, n, gh=gh)

    mesh = make_mesh()
    cfg = Stage2Config(feat_dim=768, noise_map_height=gh,
                       noise_map_width=gh, global_batch_size=bs)
    trainer = Stage2Trainer(cfg, mesh)

    out = {"metric": "stage2_overlap_ab", "batch": bs, "grid": gh,
           "input": size, "steps": steps,
           "device": str(jax.devices()[0])}
    for arm, include_image in (("images", True), ("featonly", False)):
        ds = PairedListDataset(root, lst, den_dir, input_size=(size, size),
                               include_image=include_image)
        sampler = DistributedInfiniteSampler(len(ds), 1, 0)
        mk = lambda: DataLoader(  # noqa: E731
            ds, bs, sampler, num_workers=8,
            device_put_fn=lambda b: shard_batch(mesh, b))
        t_load = loader_only_rate(mk(), steps)
        t_e2e = e2e_rate(mk(), trainer, steps)
        out[arm] = {
            "loader_s_per_batch": round(t_load, 3),
            "e2e_s_per_step": round(t_e2e, 3),
            "samples_per_s": round(bs / t_e2e, 1),
        }
    a, b = out["images"], out["featonly"]
    out["e2e_speedup"] = round(
        a["e2e_s_per_step"] / b["e2e_s_per_step"], 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
