"""Full-workload stage-1 quality/perf comparison across fit configs.

Runs the reference's headline stage-1 workload (768 views, 25k Adam steps,
DINOv2-B/518/stride14 - main_img_denoising.py defaults) on demo images,
once per config variant, reusing ONE extraction pass. Reports per variant:
  * final recon cosine (F + G + h vs raw, full grid)
  * cosine of the denoised map vs the EXACT-config fit (the quality contract
    for tuned approximations: stochastic corners, deferred table sweeps)
  * measured fit wall-clock (chunked dispatches, host-synced)

Usage: python tools/quality_stage1.py [exact stoch sweep8 ...]
Env: QS_ITERS (25000), QS_IMG (demo cat.jpg), QS_CHUNK (1000).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np


def main():
    from dvt_tpu.data.single_image import load_image
    from dvt_tpu.engine import Stage1Engine
    from dvt_tpu.stage1 import fit_image_batch_chunked

    iters = int(os.environ.get("QS_ITERS", "25000"))
    chunk = int(os.environ.get("QS_CHUNK", "1000"))
    img_path = os.environ.get("QS_IMG", "/root/reference/demo/cat.jpg")

    engine = Stage1Engine(
        model_identifier="vit_base_patch14_dinov2.lvd142m",
        stride=14,
        num_views=768,
        num_iters=iters,
        warmup_iters=max(iters // 10, 1),
        images_per_batch=1,
        optimizer_impl="fused",
    )

    variants = {
        "exact": dict(),
        "stoch": dict(stochastic_corners=True),
        "sweep8": dict(stochastic_corners=True, table_sweep_every=8),
        "sweep16": dict(stochastic_corners=True, table_sweep_every=16),
        "sweep16_exactcorners": dict(table_sweep_every=16),
        # TPU-tuned level schedules: same 16->1024 resolution span over
        # fewer levels (geometric respacing). Cuts the row-count-bound
        # gather/scatter (the dominant step cost) and the table sweep
        # proportionally; quality gate = flat recon cos + high denoised
        # cosine vs the exact fit, like stochastic corners.
        "lev12": dict(stochastic_corners=True, table_sweep_every=16,
                      n_levels=12),
        "lev10": dict(stochastic_corners=True, table_sweep_every=16,
                      n_levels=10),
        # Smaller pixel minibatch: halves the row-count-bound work per
        # step but also the gradient information; the 25k-iter recon
        # cosine decides if convergence actually suffers.
        "pix1024": dict(stochastic_corners=True, table_sweep_every=16,
                        n_levels=12, pixel_bsz=1024),
        # Level dropout on the 12-level grid (8 gather levels): sample k
        # per step, export with all levels (stage1.level_sample).
        "lvl6": dict(stochastic_corners=True, table_sweep_every=16,
                     n_levels=12, level_sample=6),
        "lvl4": dict(stochastic_corners=True, table_sweep_every=16,
                     n_levels=12, level_sample=4),
        "lvl2": dict(stochastic_corners=True, table_sweep_every=16,
                     n_levels=12, level_sample=2),
    }
    sel = sys.argv[1:] or ["exact", "stoch", "sweep16"]

    img = load_image(img_path)
    raw_b, crd_b = engine.extract_batch([img])
    np.asarray(jax.device_get(raw_b.ravel()[0]))
    keys = jax.random.split(jax.random.PRNGKey(0), 1)

    cache = os.environ.get("QS_CACHE", "/tmp/qs_exact.npy")
    results = {}
    den_exact = None
    if os.path.exists(cache) and "exact" not in sel:
        den_exact = np.load(cache)
    from dvt_tpu.stage1 import _chunk_batch, _init_batch

    for name in sel:
        cfg = dataclasses.replace(engine.cfg, **variants[name])
        k = cfg.table_sweep_every
        cfg = dataclasses.replace(cfg, num_iters=iters // k * k)
        chunk_k = max(chunk // k, 1) * k
        # warm/compile: one init + one chunk dispatch (not counted)
        wstate = _init_batch(keys, raw_b, crd_b, cfg)
        wstate, _ = _chunk_batch(
            wstate, raw_b, crd_b, cfg, np.int32(0), chunk_k)
        np.asarray(jax.device_get(
            jax.tree.leaves(wstate["params"])[0].ravel()[0]))
        del wstate
        t0 = time.time()
        den, metrics = fit_image_batch_chunked(keys, raw_b, crd_b, cfg,
                                               chunk_k)
        np.asarray(jax.device_get(den.ravel()[0]))
        dt = time.time() - t0
        den = np.asarray(den[0], np.float32)
        rec = float(np.mean(np.asarray(metrics["final_recon_cos"])))
        row = {
            "fit_s": round(dt, 1),
            "ms_per_iter": round(dt / iters * 1e3, 2),
            "final_recon_cos": round(rec, 4),
            "final_loss": round(float(np.mean(np.asarray(metrics["final_loss"]))), 4),
        }
        if name == "exact":
            den_exact = den
            np.save(cache, den)
        if den_exact is not None and name != "exact":
            a = den.reshape(-1, den.shape[-1])
            b = den_exact.reshape(-1, den.shape[-1])
            cos = np.sum(a * b, -1) / (
                np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-8
            )
            row["denoised_cos_vs_exact_mean"] = round(float(cos.mean()), 4)
            row["denoised_cos_vs_exact_p5"] = round(
                float(np.percentile(cos, 5)), 4)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    print(json.dumps({"img": img_path, "iters": iters,
                      "device": str(jax.devices()[0]), "results": results}))


if __name__ == "__main__":
    main()
