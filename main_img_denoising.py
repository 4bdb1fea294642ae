"""DVT Stage 1 CLI: per-image feature denoising.

TPU-native counterpart of the reference's main_img_denoising.py: same flag
surface (model/stride/layer_depth_ratio/num_views/num_iters/lr schedule/
start_idx+num_imgs sharding/skip-if-done resume) but the execution model is
jit(vmap(fit)): `--images_per_batch` images are fitted concurrently per chip
instead of one image per GPU process (sample_scripts/stage1.sh).
"""

import argparse
import glob
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

import dvt_tpu.models.zoo as zoo


def get_args():
    p = argparse.ArgumentParser(description="DVT Stage-1 (TPU)")
    p.add_argument("--model", type=str,
                   default="vit_base_patch14_dinov2.lvd142m",
                   choices=zoo.MODEL_LIST)
    p.add_argument("--input_size", type=int, default=518, nargs="+")
    p.add_argument("--stride_size", type=int, default=14)
    p.add_argument("--layer_depth_ratio", type=float, default=1.0)
    p.add_argument("--img_path", type=str, default=None,
                   help="image file, list .txt, or directory")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--save_root", type=str, default=None)
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--num_imgs", type=int, default=100)
    p.add_argument("--num_shards", type=int, default=None,
                   help="shard the image list (default: jax.process_count())")
    p.add_argument("--shard_id", type=int, default=None)
    p.add_argument("--num_views", type=int, default=768)
    p.add_argument("--num_iters", type=int, default=25000)
    p.add_argument("--warmup_iters", type=int, default=2500)
    p.add_argument("--n_levels", type=int, default=16)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--min_lr", type=float, default=0.001)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    # 128 measured 4.37 -> 3.64 s / 768 views on device at feature cosine
    # 1.0 vs 32 (tools/ab_extract.py) - a pure lax.map chunk-width change.
    p.add_argument("--extract_bsz", type=int, default=128)
    p.add_argument("--pixel_bsz", type=int, default=2048)
    p.add_argument("--images_per_batch", type=int, default=1,
                   help="images fitted concurrently per chip (vmap width); "
                        "1 is the measured per-chip throughput optimum "
                        "(RESULTS.md 9d) - raise only to amortize host "
                        "dispatches at a ~6% per-image cost")
    p.add_argument("--checkpoint_path", type=str, default=None,
                   help="torch .pth backbone weights to convert+load")
    p.add_argument("--feature_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--output_dir", type=str, default="./work_dirs/demo")
    p.add_argument("--vis_freq", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--optimizer_impl", type=str, default="fused",
                   choices=("fused", "pallas", "optax"),
                   help="fused: single-XLA-expression Adam (one HBM pass); "
                        "pallas: explicit kernel; optax: oracle chain")
    p.add_argument("--matmul_level_threshold", type=int, default=4096,
                   help="hash levels <= this many entries use one-hot "
                        "matmuls (MXU) instead of gather/scatter")
    p.add_argument("--stochastic_corners", action="store_true",
                   help="sample 1 corner/level (bilinear-weight prob) on "
                        "gather levels during the fit: 4x fewer scatter "
                        "rows, unbiased")
    p.add_argument("--table_sweep_every", type=int, default=1,
                   help="defer the dense hash-table Adam sweep to once "
                        "every K steps (accumulated row grads, lr x K); "
                        "amortizes the table-sized HBM passes. 1 = exact "
                        "reference semantics")
    p.add_argument("--level_sample", type=int, default=0,
                   help="level dropout: sample this many gather levels "
                        "per fit step (kept levels scaled, dropped slots "
                        "zero; export uses all levels). 0 = off")
    args = p.parse_args()
    if isinstance(args.input_size, int):
        args.input_size = (args.input_size, args.input_size)
    else:
        args.input_size = tuple(args.input_size[:2]) if len(args.input_size) > 1 \
            else (args.input_size[0], args.input_size[0])
    return args


def collect_filenames(args):
    if args.img_path is None:
        raise SystemExit("--img_path is required")
    if os.path.isfile(args.img_path):
        if args.img_path.endswith("txt"):
            with open(args.img_path) as f:
                names = [ln.strip().split(" ")[0] for ln in f if ln.strip()]
        else:
            names = [args.img_path]
    else:
        exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff")
        names = sorted(
            glob.glob(os.path.join(args.img_path, "**/*"), recursive=True)
        )
        # filter to decodable images at list time: a stray README/json
        # deep in the tree would otherwise abort a long run mid-batch
        names = [n for n in names
                 if os.path.isfile(n) and n.lower().endswith(exts)]
        # key saved features by path RELATIVE to the scanned directory
        # (basename-only keys would collide across subdirs), and make the
        # names relative so the data_root re-join below doesn't double-
        # prefix them
        names = [os.path.relpath(n, args.img_path) for n in names]
        if args.data_root is None:
            args.data_root = args.img_path
    names = names[args.start_idx : args.start_idx + args.num_imgs]
    # multi-host job sharding: each process takes a stripe (the reference
    # does this with one process per GPU + start_idx arithmetic,
    # sample_scripts/stage1.sh:8-18)
    import jax

    num_shards = args.num_shards or jax.process_count()
    shard_id = args.shard_id if args.shard_id is not None else jax.process_index()
    if num_shards > 1:
        names = names[shard_id::num_shards]
    return names


def main():
    from dvt_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # DVT_PLATFORM=cpu forces host (axon ignores JAX_PLATFORMS)

    args = get_args()
    os.makedirs(args.output_dir, exist_ok=True)
    print(f"Arguments:\n{json.dumps(vars(args), indent=2)}")

    from dvt_tpu.engine import Stage1Engine

    engine = Stage1Engine(
        model_identifier=args.model,
        stride=args.stride_size,
        input_size=args.input_size,
        layer_depth_ratio=args.layer_depth_ratio,
        num_views=args.num_views,
        num_iters=args.num_iters,
        warmup_iters=args.warmup_iters,
        n_levels=args.n_levels,
        pixel_bsz=args.pixel_bsz,
        extract_bsz=min(args.extract_bsz, args.num_views),
        images_per_batch=args.images_per_batch,
        feature_dtype=args.feature_dtype,
        checkpoint_path=args.checkpoint_path,
        seed=args.seed,
        optimizer_impl=args.optimizer_impl,
        matmul_level_threshold=args.matmul_level_threshold,
        stochastic_corners=args.stochastic_corners,
        table_sweep_every=args.table_sweep_every,
        level_sample=args.level_sample,
    )

    filenames = collect_filenames(args)
    todo = []
    for name in filenames:
        full = os.path.join(args.data_root, name) if args.data_root else name
        if args.save_root and engine.already_done(
            args.save_root, args.data_root or "", full
        ):
            print(f"Skipping {full}")
            continue
        todo.append(full)

    start = time.time()
    done = 0
    for bidx, s in enumerate(range(0, len(todo), args.images_per_batch)):
        batch = todo[s : s + args.images_per_batch]
        t0 = time.time()
        if bidx % max(args.vis_freq // max(args.images_per_batch, 1), 1) == 0:
            raw, denoised, metrics, panels = engine.denoise_batch_with_vis(batch)
            vis_dir = os.path.join(args.output_dir, "visualization")
            os.makedirs(vis_dir, exist_ok=True)
            from PIL import Image

            for path, panel in zip(batch, panels):
                name = os.path.splitext(os.path.basename(str(path)))[0]
                Image.fromarray(panel).save(
                    os.path.join(vis_dir, f"{name}.jpg")
                )
        else:
            raw, denoised, metrics = engine.denoise_batch(batch)
        dt = time.time() - t0
        done += len(batch)
        for i, path in enumerate(batch):
            if args.save_root:
                engine.save_features(
                    args.save_root, args.data_root or "", path,
                    raw[i], denoised[i],
                )
        cos = float(np.mean(metrics["final_recon_cos"]))
        eta = (time.time() - start) / done * (len(todo) - done)
        print(
            f"[{done}/{len(todo)}] batch {dt:.1f}s "
            f"({dt / len(batch):.2f}s/img) recon_cos={cos:.4f} "
            f"ETA {eta / 60:.1f}min"
        )
    print(f"Total: {time.time() - start:.1f}s for {done} images")


if __name__ == "__main__":
    main()
