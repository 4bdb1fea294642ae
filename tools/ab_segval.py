"""Device A/B: per-window vs batched seg val inference wall-clock.

VERDICT r2 asked for a device-measured val-sweep wall-clock drop for the
batched seg inference (eval/seg.py slide_inference_batched, the pattern
the reference gets from 8-way DDP eval, evaluation/depth/apis/train.py:
61-66). This runs BOTH paths over the same synthetic val images with the
same random-weight probe, asserts the argmax predictions are identical,
and reports seconds + dispatch rounds per path.

Usage: python tools/ab_segval.py
Env: SV_IMAGES (default 8), SV_MODEL (vit_small_patch16_224.dino),
     SV_WINDOW_BATCH (8), SV_SIZE (700 -> 2x2=4 windows/image at the
     512/341 VOC slide geometry), SV_CROP / SV_STRIDE (override the
     slide geometry so a 1-core CPU smoke can run tiny shapes).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    import jax

    if os.environ.get("DVT_PLATFORM"):  # axon ignores JAX_PLATFORMS
        jax.config.update("jax_platforms", os.environ["DVT_PLATFORM"])
    else:
        from bench import wait_for_device

        if not wait_for_device(900):
            raise SystemExit("device not ready")
    from bench import device_calibration
    import jax.numpy as jnp

    from dvt_tpu.eval.glue import make_feature_fn
    from dvt_tpu.eval.seg import (
        SegLinearProbe,
        slide_inference,
        slide_inference_batched,
    )
    from dvt_tpu.models.vit import ViTWrapper

    gbps, tflops = device_calibration(jax, jnp)
    n_imgs = int(os.environ.get("SV_IMAGES", "8"))
    model = os.environ.get("SV_MODEL", "vit_small_patch16_224.dino")
    wb = int(os.environ.get("SV_WINDOW_BATCH", "8"))
    size = int(os.environ.get("SV_SIZE", "700"))
    crop = int(os.environ.get("SV_CROP", "512"))
    stride = int(os.environ.get("SV_STRIDE", "341"))
    num_classes = 21

    wrapper = ViTWrapper(model, seed=0)
    fn, fparams = make_feature_fn(wrapper, pad_multiple=wrapper.patch_size)
    probe = SegLinearProbe(fn, num_classes, feature_params=fparams,
                           mesh=None, lr=1e-3, weight_decay=0.0,
                           total_iters=10, seed=0)
    rng = np.random.default_rng(0)
    images = [rng.standard_normal((size, size, 3)).astype(np.float32)
              for _ in range(n_imgs)]
    state = probe.init_state(jnp.zeros((1, crop, crop, 3), jnp.float32))

    def logits_fn(b):
        return probe.predict_logits(state, b)

    def sync(x):
        np.asarray(x[0].ravel()[0] if isinstance(x, list) else x)

    # warm both compiles at the ACTUAL window shape (slide geometry
    # clamps windows to min(crop, size); warming the wrong shape would
    # put a full XLA compile inside the timed region)
    wc = min(crop, size)
    sync(np.asarray(logits_fn(jnp.zeros((1, wc, wc, 3)))))
    sync(np.asarray(logits_fn(jnp.zeros((wb, wc, wc, 3)))))

    t0 = time.time()
    maps_loop = [
        slide_inference(logits_fn, im, num_classes,
                        crop=(crop, crop), stride=(stride, stride))
        for im in images
    ]
    sync(np.asarray(maps_loop[-1]))  # in-order queue: last done => all done
    t_loop = time.time() - t0

    # derive argmax preds from the SAME timed pass's logit maps (running
    # slide_inference twice doubled device work on the throttled tunnel -
    # ADVICE r4); the maps also make the batched comparison tolerance-based
    preds_loop = [m.argmax(-1) for m in maps_loop]

    grids = max(int(np.ceil((size - crop) / stride)) + 1, 1)
    n_windows = grids * grids * n_imgs  # 700^2 at 512/341 -> 2x2
    wbs = ([2, 4, wb, 2 * wb] if os.environ.get("SV_SWEEP") == "1"
           else [wb])
    fail = False
    for wbi in wbs:
        sync(np.asarray(logits_fn(jnp.zeros((wbi, wc, wc, 3)))))  # warm
        t0 = time.time()
        maps = slide_inference_batched(logits_fn, images, num_classes,
                                       crop=(crop, crop),
                                       stride=(stride, stride),
                                       window_batch=wbi)
        sync(np.asarray(maps[-1]))
        t_batched = time.time() - t0
        # argmax outside the timed region, mirroring the loop arm
        preds_batched = [m.argmax(-1) for m in maps]

        mismatch = sum(
            int((a != b).sum()) for a, b in zip(preds_loop, preds_batched)
        )
        total_px = sum(a.size for a in preds_loop)
        # TPU batch-N vs batch-1 matmuls legitimately differ in tiling /
        # accumulation order, so bitwise argmax equality is the CPU
        # test's job (tests/test_eval.py, fp32, exact). On device the
        # contract is: logit perturbation small vs the logit scale, and
        # argmax flips confined to near-ties (a sub-percent fraction on
        # random-weight logits, which are ties almost everywhere).
        logit_scale = float(np.mean([np.abs(m).max() for m in maps_loop]))
        logit_diff = float(max(
            np.abs(np.asarray(a) - np.asarray(b)).max()
            for a, b in zip(maps_loop, maps)
        ))
        rel = logit_diff / max(logit_scale, 1e-9)
        flip_frac = mismatch / max(total_px, 1)
        ok = rel < 3e-2 and flip_frac < 5e-3
        fail |= not ok
        out = {
            "metric": "segval_ab",
            "model": model,
            "images": n_imgs,
            "windows": n_windows,
            "window_batch": wbi,
            "per_window_s": round(t_loop, 2),
            "batched_s": round(t_batched, 2),
            "speedup": round(t_loop / t_batched, 2),
            "dispatches_loop": n_windows,
            "dispatches_batched": int(np.ceil(n_windows / wbi)),
            "pred_pixel_mismatch": mismatch,
            "argmax_flip_frac": round(flip_frac, 5),
            "max_logit_rel_diff": round(rel, 5),
            "pass": ok,
            "device_hbm_gbps_measured": gbps,
            "device_bf16_tflops_measured": tflops,
        }
        print(json.dumps(out), flush=True)
        with open("/tmp/segval_ab.json", "a") as f:
            f.write(json.dumps(out) + "\n")
    if fail:
        raise SystemExit(1)  # numerics regression must fail loudly


if __name__ == "__main__":
    main()
