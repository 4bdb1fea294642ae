"""Extraction-phase A/B: stage-1 feature extraction configs, one session.

At the round-2 tuned fit (1.39 ms/iter), extraction is ~11% of stage-1
wall and untouched (VERDICT r2 #4 / SURVEY §3.1 hot loop #1). This tool
times `Stage1Engine.extract_batch` (render 768 crops + ViT-B fwd + coords,
one dispatch) across variants in ONE session, and reports each variant's
full-map feature cosine vs the base config so speedups that change
numerics are visible.

Variants: extract_bsz (lax.map chunk width), flash vs einsum attention at
1369 tokens, fp32 ViT compute, fp32 pool storage.

Usage: python tools/ab_extract.py [base bsz64 flash ...]   (default: all)
Env: AB_VIEWS (768), AB_REPS (2).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

VARIANTS = {
    "base": {},
    "bsz16": dict(extract_bsz=16),
    "bsz64": dict(extract_bsz=64),
    "bsz128": dict(extract_bsz=128),
    "flash": dict(extract_attention="flash"),
    "vit_fp32": dict(vit_dtype="float32"),
    "pool_fp32": dict(feature_dtype="float32"),
}


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

    from dvt_tpu.data.single_image import load_image
    from dvt_tpu.engine import Stage1Engine

    sel = sys.argv[1:] or list(VARIANTS)
    if "base" not in sel:
        # the cosine-vs-base numerics guard needs the base features
        sel = ["base"] + sel
    elif sel.index("base") != 0:
        sel = ["base"] + [v for v in sel if v != "base"]
    views = int(os.environ.get("AB_VIEWS", "768"))
    reps = int(os.environ.get("AB_REPS", "2"))
    img = load_image("/root/reference/demo/cat.jpg")

    gbps, tflops = device_calibration(jax, jnp)
    print(json.dumps({"calibration": {"hbm_gbps": gbps,
                                      "bf16_tflops": tflops}}),
          flush=True)

    base_feats = None
    results = {}
    for name in sel:
        cfg = VARIANTS[name]
        engine = Stage1Engine(
            model_identifier="vit_base_patch14_dinov2.lvd142m",
            stride=14, num_views=views, num_iters=16, warmup_iters=1,
            images_per_batch=1, **cfg,
        )
        raw, crd = engine.extract_batch([img])  # compile + warm
        np.asarray(jax.device_get(raw.ravel()[0]))
        t0 = time.time()
        for _ in range(reps):
            raw, crd = engine.extract_batch([img])
            np.asarray(jax.device_get(raw.ravel()[0]))
        dt = (time.time() - t0) / reps
        feats = np.asarray(raw[0], np.float32)  # (V+1, h, w, C)
        row = {"extract_s": round(dt, 3),
               "views_per_s": round(views / dt, 1)}
        if name == "base":
            base_feats = feats
        elif base_feats is not None:
            a = feats.reshape(-1, feats.shape[-1])
            b = base_feats.reshape(-1, feats.shape[-1])
            cos = np.sum(a * b, -1) / (
                np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
                + 1e-8)
            row["cos_vs_base_mean"] = round(float(cos.mean()), 5)
            row["cos_vs_base_min"] = round(float(cos.min()), 5)
        results[name] = row
        print(json.dumps({name: row}), flush=True)
        del engine
    print(json.dumps({"device": str(jax.devices()[0]),
                      "views": views, "results": results}))


if __name__ == "__main__":
    main()
