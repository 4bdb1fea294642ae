"""Dataset-scale quality validation of the tuned stage-1 fast path.

Round-2 left the tuned bench config (stochastic corners + deferred sweep
K=16 + 12-level grid + level dropout 4-of-8) quality-validated on only two
images, with puppy.jpg showing a denoised-vs-exact p5 cosine of 0.9674 —
below the >=0.99 fidelity bar of BASELINE.md. This sweep settles the
question at N>=32 images: for each image it runs the reference-exact fit
and the tuned fit on the SAME extraction, and reports the per-patch cosine
distribution (mean/p5/min) of tuned-denoised vs exact-denoised per image.

Two extra measurements contextualize the bar:
  * seed floor (subset): exact-vs-exact with a different fit seed — the
    intrinsic run-to-run variance of the method itself (the reference's
    25k-step Adam fit is just as seed-dependent,
    /root/reference/main_img_denoising.py:180-198). A tuned path cannot be
    expected to agree with the exact fit more closely than the exact fit
    agrees with itself.
  * adaptive fallback: images where the tuned config's p5 < 0.99 are
    re-run with the no-dropout fallback (12-level + sweep16) so the data
    to re-pick bench defaults comes out of the same sweep.

Image set: both demo images + DAVIS frames (real photos) + synthetic VOC
(procedural shapes/textures). All fits use the full headline workload
(768 views, 25k Adam steps, DINOv2-B/518/stride14).

Resumable: one JSON line per image appended to --out; finished images are
skipped on restart.

Usage:  python tools/quality_sweep.py [--out /tmp/quality_sweep.jsonl]
Env:    QS_ITERS (25000), QS_CHUNK (1000), QS_N_DAVIS (16), QS_N_SYNTH (16),
        QS_FLOOR_EVERY (4: every 4th image also gets the seed-floor run).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

if os.environ.get("QS_CPU"):  # smoke-test mode (axon ignores JAX_PLATFORMS)
    jax.config.update("jax_platforms", "cpu")

import numpy as np

DEMO = "/root/reference/demo"

EXACT = dict()
TUNED = dict(stochastic_corners=True, table_sweep_every=16, n_levels=12,
             level_sample=4)
FALLBACK = dict(stochastic_corners=True, table_sweep_every=16, n_levels=12)

# Candidate-config mode: QS_TUNED_JSON overrides the TUNED dict (fields of
# Stage1Config, e.g. '{"stochastic_corners": true, "table_sweep_every": 16,
# "n_levels": 12, "level_sample": 4, "pixel_bsz": 1024}') so the same
# harness + seed-floor analysis evaluates a new bench-default candidate.
if os.environ.get("QS_TUNED_JSON"):
    TUNED = json.loads(os.environ["QS_TUNED_JSON"])


def build_image_list(n_davis, n_synth):
    imgs = [os.path.join(DEMO, "cat.jpg"), os.path.join(DEMO, "puppy.jpg")]
    davis_dir = os.path.join(DEMO, "davis-mallard-water")
    frames = sorted(os.listdir(davis_dir))
    step = max(len(frames) // max(n_davis, 1), 1)
    imgs += [os.path.join(davis_dir, f) for f in frames[::step][:n_davis]]
    synth_root = "/tmp/dvt_synth_sweep/voc"

    def _cached_count():
        lst = os.path.join(synth_root, "voc_train.txt")
        if not os.path.isfile(lst):
            return 0
        with open(lst) as f:
            return sum(1 for ln in f if ln.strip())

    if _cached_count() < n_synth:
        # a stale smaller cache would silently shrink the advertised N
        import shutil
        shutil.rmtree(synth_root, ignore_errors=True)
        from tools.make_synthetic_data import make_voc
        rng = np.random.default_rng(7)
        make_voc(synth_root, n_synth, 0, 8, 518, rng)
    with open(os.path.join(synth_root, "voc_train.txt")) as f:
        rels = [ln.strip() for ln in f if ln.strip()][:n_synth]
    imgs += [os.path.join(synth_root, r) for r in rels]
    return imgs


def cos_stats(a, b):
    a = a.reshape(-1, a.shape[-1]).astype(np.float64)
    b = b.reshape(-1, b.shape[-1]).astype(np.float64)
    cos = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-8)
    return (round(float(cos.mean()), 4),
            round(float(np.percentile(cos, 5)), 4),
            round(float(cos.min()), 4))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/quality_sweep.jsonl")
    args = p.parse_args()

    if not os.environ.get("QS_CPU"):
        from bench import wait_for_device

        if not wait_for_device(1800):
            raise SystemExit("device never became ready")

    from dvt_tpu.data.single_image import load_image
    from dvt_tpu.engine import Stage1Engine
    from dvt_tpu.stage1 import fit_image_batch_chunked

    iters = int(os.environ.get("QS_ITERS", "25000"))
    chunk = int(os.environ.get("QS_CHUNK", "1000"))
    # 0 disables the seed-floor runs entirely
    floor_every = int(os.environ.get("QS_FLOOR_EVERY", "4"))
    imgs = build_image_list(int(os.environ.get("QS_N_DAVIS", "16")),
                            int(os.environ.get("QS_N_SYNTH", "16")))

    tuned_id = json.dumps(TUNED, sort_keys=True)
    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for ln in f:
                try:
                    r = json.loads(ln)
                except Exception:
                    continue
                # rows from a DIFFERENT tuned config must not satisfy
                # resume (a QS_TUNED_JSON candidate against an old --out
                # would otherwise skip every image and report stale rows)
                if r.get("tuned_config", tuned_id) == tuned_id:
                    done.add(r["img"])

    views = int(os.environ.get("QS_VIEWS", "768"))
    engine = Stage1Engine(
        model_identifier=os.environ.get(
            "QS_MODEL", "vit_base_patch14_dinov2.lvd142m"),
        stride=int(os.environ.get("QS_STRIDE", "14")),
        num_views=views, num_iters=iters,
        warmup_iters=max(iters // 10, 1), images_per_batch=1,
        extract_bsz=min(32, views),
        optimizer_impl="fused",
    )

    def run_fit(raw_b, crd_b, variant, seed):
        cfg = dataclasses.replace(engine.cfg, **variant)
        k = cfg.table_sweep_every
        # never floor to 0 iters (QS_ITERS smaller than K in smoke runs)
        cfg = dataclasses.replace(cfg, num_iters=max(iters // k, 1) * k)
        chunk_k = max(chunk // k, 1) * k
        keys = jax.random.split(jax.random.PRNGKey(seed), 1)
        t0 = time.time()
        den, metrics = fit_image_batch_chunked(keys, raw_b, crd_b, cfg,
                                               chunk_k)
        den = np.asarray(den[0], np.float32)  # materialize = host sync
        dt = time.time() - t0
        rec = float(np.mean(np.asarray(metrics["final_recon_cos"])))
        return den, round(rec, 4), round(dt, 1)

    for idx, img_path in enumerate(imgs):
        if img_path in done:
            continue
        img = load_image(img_path)
        raw_b, crd_b = engine.extract_batch([img])
        np.asarray(jax.device_get(raw_b.ravel()[0]))

        row = {"img": img_path, "iters": iters, "tuned_config": tuned_id}
        den_exact, row["recon_exact"], row["fit_s_exact"] = run_fit(
            raw_b, crd_b, EXACT, seed=0)
        den_tuned, row["recon_tuned"], row["fit_s_tuned"] = run_fit(
            raw_b, crd_b, TUNED, seed=0)
        m, p5, mn = cos_stats(den_tuned, den_exact)
        row.update(tuned_cos_mean=m, tuned_cos_p5=p5, tuned_cos_min=mn)

        if floor_every > 0 and idx % floor_every == 0:
            den_f, row["recon_floor"], _ = run_fit(
                raw_b, crd_b, EXACT, seed=1)
            m, p5, mn = cos_stats(den_f, den_exact)
            row.update(floor_cos_mean=m, floor_cos_p5=p5, floor_cos_min=mn)

        if row["tuned_cos_p5"] < 0.99:
            den_fb, row["recon_fb"], row["fit_s_fb"] = run_fit(
                raw_b, crd_b, FALLBACK, seed=0)
            m, p5, mn = cos_stats(den_fb, den_exact)
            row.update(fb_cos_mean=m, fb_cos_p5=p5, fb_cos_min=mn)

        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    print(json.dumps({"done": True, "n": len(imgs),
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
