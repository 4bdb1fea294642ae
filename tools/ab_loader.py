"""Host A/B: stage-2 batch assembly — threaded Python path vs native C++.

RESULTS.md §2 measured stage-2 training at 2.2 s/step *data-loader bound*
on this 1-core host: the per-item path runs PIL JPEG decode + two np.load
calls per sample inside GIL-bound Python threads. The native path
(native/dvt_host.cpp dvt_load_paired_batch) does JPEG decode + AA-bicubic
resize + normalize + both .npy reads for the whole batch in one OpenMP
region with the GIL released. This measures both on the same synthetic
stage-2 fixture (reference on-disk contract: JPEGImages/*.jpg +
{raw,denoised}_features/<model>/JPEGImages/*.npy, 37x37x768 fp32 as
dumped by main_img_denoising.py for DINOv2-B/518/s14).

Usage: python tools/ab_loader.py
Env: AL_IMAGES (default 16), AL_BATCH (8), AL_ROUNDS (6), AL_SIZE (518).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_fixture(root: str, n: int, gh: int = 37, dim: int = 768):
    from PIL import Image

    img_dir = os.path.join(root, "JPEGImages")
    raw_dir = os.path.join(root, "raw_features", "m", "JPEGImages")
    den_dir = os.path.join(root, "denoised_features", "m", "JPEGImages")
    for d in (img_dir, raw_dir, den_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    rels = []
    for i in range(n):
        rel = f"JPEGImages/{i:04d}.jpg"
        arr = rng.integers(0, 255, (640, 480, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(root, rel), quality=92)
        feat = rng.standard_normal((gh, gh, dim)).astype(np.float32)
        np.save(os.path.join(raw_dir, f"{i:04d}.npy"), feat)
        np.save(os.path.join(den_dir, f"{i:04d}.npy"), feat * 0.5)
        rels.append(rel)
    lst = os.path.join(root, "list.txt")
    with open(lst, "w") as f:
        f.write("\n".join(rels) + "\n")
    # feat_root excludes the rel path's own JPEGImages/ segment
    return lst, os.path.join(root, "denoised_features", "m")


def main():
    from concurrent.futures import ThreadPoolExecutor

    from dvt_tpu.data.native import native_available
    from dvt_tpu.data.paired_list import PairedListDataset
    from dvt_tpu.data.prefetch import _stack

    n = int(os.environ.get("AL_IMAGES", "16"))
    bs = int(os.environ.get("AL_BATCH", "8"))
    rounds = int(os.environ.get("AL_ROUNDS", "6"))
    size = int(os.environ.get("AL_SIZE", "518"))
    root = "/tmp/dvt_ab_loader"
    shutil.rmtree(root, ignore_errors=True)
    lst, den_dir = build_fixture(root, n)

    ds = PairedListDataset(root, lst, den_dir, input_size=(size, size))
    rng = np.random.default_rng(1)
    idx_rounds = [rng.integers(0, n, bs).tolist() for _ in range(rounds + 1)]

    # ---- threaded per-item path (what the loader does sans get_batch) ----
    pool = ThreadPoolExecutor(8)
    _stack(list(pool.map(ds.__getitem__, idx_rounds[0])))  # warm (file cache)
    t0 = time.time()
    for idxs in idx_rounds[1:]:
        b_py = _stack(list(pool.map(ds.__getitem__, idxs)))
    t_py = (time.time() - t0) / rounds

    # ---- native whole-batch path ----
    ok = native_available()
    t_nat, mismatch = None, None
    if ok:
        b = ds.get_batch(idx_rounds[0])
        ok = b is not None
    if ok:
        t0 = time.time()
        for idxs in idx_rounds[1:]:
            b_nat = ds.get_batch(idxs)
        t_nat = (time.time() - t0) / rounds
        # same final indices in both timings -> comparable contents.
        # feature reads must be bit-exact; images differ by PIL's own
        # two-pass uint8 fixed-point resize (native is float-exact vs
        # torch antialias=True - see resize_bicubic in dvt_host.cpp).
        mismatch = {
            "img_max_abs": round(float(
                np.abs(b_py["image"] - b_nat["image"]).max()), 4),
            "raw_max_abs": float(np.abs(
                b_py["original_feats"] - b_nat["original_feats"]).max()),
            "den_max_abs": float(np.abs(
                b_py["denoised_feats"] - b_nat["denoised_feats"]).max()),
        }

    out = {
        "metric": "stage2_loader_ab",
        "batch": bs, "input": size, "rounds": rounds,
        "python_s_per_batch": round(t_py, 3),
        "python_samples_per_s": round(bs / t_py, 1),
        "native_available": bool(ok),
        "native_s_per_batch": round(t_nat, 3) if t_nat else None,
        "native_samples_per_s": round(bs / t_nat, 1) if t_nat else None,
        "speedup": round(t_py / t_nat, 2) if t_nat else None,
        "content_delta": mismatch,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
