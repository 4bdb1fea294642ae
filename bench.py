"""Benchmark: stage-1 per-image denoising throughput on one TPU chip.

Measures the reference's headline workload (main_img_denoising.py defaults:
DINOv2-B, stride 14, 518^2, 768 views, 25k Adam steps per image) end to end:
on-device crop rendering + ViT feature extraction + the vmapped 25k-step
neural-field fit, in images/sec on a single chip.

Baseline: the reference runs one image per A100 process; its runtime prints
put feature extraction + 25k-step fit at ~60 s/image on A100 (768 ViT-B
fp32 forwards at 1369 tokens plus 25k tiny CUDA steps; see BASELINE.md -
the repo publishes no official throughput, so vs_baseline uses this
estimate: baseline_images_per_sec = 1/60).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: BENCH_IMAGES (default 4), BENCH_VIEWS (768), BENCH_ITERS (25000),
BENCH_FAST=1 (tiny smoke config).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

BASELINE_SEC_PER_IMAGE_A100 = 60.0


def find_demo_image():
    for cand in [
        "/root/reference/demo/assets/demo/cat.jpg",
        "/root/reference/demo/cat.jpg",
    ]:
        if os.path.isfile(cand):
            return cand
    import glob

    hits = glob.glob("/root/reference/demo/**/*.jpg", recursive=True)
    return hits[0] if hits else None


def main():
    import jax

    from dvt_tpu.engine import Stage1Engine

    fast = os.environ.get("BENCH_FAST") == "1"
    n_images = int(os.environ.get("BENCH_IMAGES", "2" if fast else "4"))
    num_views = int(os.environ.get("BENCH_VIEWS", "32" if fast else "768"))
    num_iters = int(os.environ.get("BENCH_ITERS", "200" if fast else "25000"))

    engine = Stage1Engine(
        model_identifier="vit_base_patch14_dinov2.lvd142m",
        stride=14,
        num_views=num_views,
        num_iters=num_iters,
        warmup_iters=max(num_iters // 10, 1),
        images_per_batch=n_images,
    )

    img_path = find_demo_image()
    if img_path is None:
        rng = np.random.default_rng(0)
        inputs = [
            (rng.random((518, 518, 3)) * 255).astype(np.uint8)
            for _ in range(n_images)
        ]
    else:
        from dvt_tpu.data.single_image import load_image

        base = load_image(img_path)
        rng = np.random.default_rng(0)
        # distinct images: jitter the demo image so fits don't trivially share
        inputs = [
            np.clip(
                base.astype(np.int16)
                + rng.integers(-8, 8, base.shape, dtype=np.int16),
                0,
                255,
            ).astype(np.uint8)
            for _ in range(n_images)
        ]

    # warmup/compile pass on a single tiny batch (cached for the timed run)
    t_compile = time.time()
    raw, denoised, metrics = engine.denoise_batch(inputs)
    jax.block_until_ready(denoised)
    compile_and_run = time.time() - t_compile

    # timed run
    t0 = time.time()
    raw, denoised, metrics = engine.denoise_batch(inputs)
    jax.block_until_ready(denoised)
    elapsed = time.time() - t0

    images_per_sec = n_images / elapsed
    baseline_ips = 1.0 / BASELINE_SEC_PER_IMAGE_A100
    result = {
        "metric": "stage1_denoise_throughput",
        "value": round(images_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / baseline_ips, 2),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "n_images": n_images,
                    "num_views": num_views,
                    "num_iters": num_iters,
                    "elapsed_s": round(elapsed, 2),
                    "first_run_s": round(compile_and_run, 2),
                    "final_recon_cos": float(
                        np.mean(metrics["final_recon_cos"])
                    ),
                    "device": str(jax.devices()[0]),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
