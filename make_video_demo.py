"""Video demo generator: per-frame feature visualizations as mp4/gif.

TPU counterpart of the reference's make_video_demo.py: run a (optionally
distilled) backbone at a small stride over a frame directory and write the
reference's per-mode videos (make_video_demo.py:219-238) plus per-frame
pngs (:90-212):

  image, instance_pca (frame-0 robust PCA), dataset_pca (clip-level PCA;
  the reference uses precomputed demo/assets/stats.pth - pass it via
  --stats_path (torch .pth or .npz) for the reference-exact mappings, or
  we fit the same statistics from a frame sample), kmeans (fit on frame
  0, predicted on the rest), first/second/third_pca (inferno single
  components), fg_pca (mask 1 - pca2 > 0.1), fg_pca_standard (sign of
  the standard mapping; without --stats_path ours is the clip PCA's
  negated 2nd direction), norm (softmax/5 temperature), and a combined
  features.mp4 panel. With --denoiser_ckpt a raw-vs-denoised
  side-by-side (side_by_side.mp4) is also written.
"""

import argparse
import glob
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

import dvt_tpu.models.zoo as zoo


def get_args():
    p = argparse.ArgumentParser("DVT video demo (TPU)")
    p.add_argument("--model", type=str,
                   default="vit_base_patch14_dinov2.lvd142m",
                   choices=zoo.MODEL_LIST)
    p.add_argument("--frames_dir", type=str, required=True,
                   help="directory of ordered frames (jpg/png)")
    p.add_argument("--vit_ckpt", type=str, default=None)
    p.add_argument("--denoiser_ckpt", type=str, default=None)
    p.add_argument("--stride_size", type=int, default=7)
    p.add_argument("--attention_impl", type=str, default="flash",
                   choices=("einsum", "flash"),
                   help="flash (default): Pallas streaming-softmax "
                        "attention - at stride 4 the grid is ~26k tokens "
                        "and quadratic SDPA would materialize the score "
                        "matrix")
    p.add_argument("--input_size", type=int, default=294, nargs="+",
                   help="H [W]; the reference demo runs 490 854 at stride "
                        "4 (~25.3k tokens, make_video_demo.py:21-27)")
    p.add_argument("--num_clusters", type=int, default=8)  # reference KMeans(n_clusters=8)
    p.add_argument("--stats_frames", type=int, default=8,
                   help="frames used to fit shared PCA stats")
    p.add_argument("--stats_path", type=str, default=None,
                   help="precomputed dataset PCA stats: the reference's "
                        "demo/assets/stats.pth (torch) or an .npz with "
                        "denoised_reduct_mat_full (C,3) + "
                        "denoised_standard_mapping (C,). When given, the "
                        "dataset_pca / fg_pca_standard mappings are "
                        "reference-exact instead of fit from "
                        "--stats_frames (make_video_demo.py:102-106)")
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("--output_dir", type=str, default="./work_dirs/video_demo")
    return p.parse_args()


def write_video(path, frames, fps):
    """mp4 via imageio if available, else animated GIF via PIL."""
    try:
        import imageio

        imageio.mimsave(path, frames, fps=fps)
        return path
    except Exception:
        from PIL import Image

        gif = os.path.splitext(path)[0] + ".gif"
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
        return gif


def main():
    from dvt_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # DVT_PLATFORM=cpu forces host (axon ignores JAX_PLATFORMS)

    args = get_args()
    import jax.numpy as jnp

    from dvt_tpu.data.single_image import load_image, resize_image
    from dvt_tpu.eval.glue import make_feature_fn
    from dvt_tpu.models.online_denoiser import Denoiser
    from dvt_tpu.models.vit import ViTWrapper
    from dvt_tpu.utils.visualization import (
        get_cluster_map,
        get_pca_map,
        get_robust_pca,
        get_scale_map,
        hcat,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    frames = sorted(
        glob.glob(os.path.join(args.frames_dir, "*.jpg"))
        + glob.glob(os.path.join(args.frames_dir, "*.png"))
    )
    if not frames:
        raise SystemExit(f"no frames in {args.frames_dir}")

    wrapper = ViTWrapper(
        args.model, stride=args.stride_size,
        checkpoint_path=args.vit_ckpt, dtype=jnp.bfloat16,
        attention_impl=args.attention_impl,
    )
    denoiser = denoiser_params = None
    if args.denoiser_ckpt:
        from main_distillation import load_denoiser_params

        from dvt_tpu.models.online_denoiser import denoiser_from_params

        denoiser_params = load_denoiser_params(args.denoiser_ckpt)
        denoiser = denoiser_from_params(
            denoiser_params, wrapper.n_output_dims, dtype=jnp.bfloat16)
    feature_fn, fparams = make_feature_fn(wrapper, denoiser, denoiser_params)
    raw_fn, raw_params = make_feature_fn(wrapper)  # raw mode for side-by-side

    hw = args.input_size if isinstance(args.input_size, list) else [
        args.input_size]
    size = (hw[0], hw[1] if len(hw) > 1 else hw[0])
    mean = np.asarray(wrapper.cfg.mean, np.float32)
    std = np.asarray(wrapper.cfg.std, np.float32)

    _feat_cache = {}

    def frame_feats(path, fn=feature_fn, fp=fparams, cache=False):
        # the stats pass and the frame loop would otherwise each run the
        # full ViT forward on the sampled frames (the most expensive op
        # here). Only the stats pass populates the cache (fp16, keyed by
        # (path, mode) so the raw-mode side-by-side pass is never served
        # denoised features); the frame loop pops its hit, so memory
        # stays bounded by the stats sample, not the clip length.
        key = (path, id(fn))
        if key in _feat_cache:
            img, f16 = _feat_cache.pop(key)
            return img, f16.astype(np.float32)
        img = resize_image(load_image(path), size)
        x = (img.astype(np.float32) / 255.0 - mean) / std
        f = fn(fp, jnp.asarray(x[None]))
        f = np.asarray(f[0], np.float32)
        if cache:
            _feat_cache[key] = (img, f.astype(np.float16))
        return img, f

    import jax

    from dvt_tpu.utils.kmeans import cosine_kmeans_fit, cosine_kmeans_predict
    from dvt_tpu.utils.visualization import _cmap

    # dataset-level PCA stats from a frame sample (replaces stats.pth)
    n_stats = max(args.stats_frames, 1)
    sample = frames[:: max(len(frames) // n_stats, 1)]
    stat_feats = np.concatenate(
        [frame_feats(p, cache=True)[1].reshape(-1, wrapper.n_output_dims)
         for p in sample]
    )
    if args.stats_path:
        # reference-exact mappings from the released artifact
        # (make_video_demo.py:102-106: denoised_reduct_mat_full drives
        # dataset_pca + the single-component modes,
        # denoised_standard_mapping gates fg_pca_standard)
        if args.stats_path.endswith(".npz"):
            st = dict(np.load(args.stats_path))
        else:  # demo/assets/stats.pth
            import torch

            st = {k: np.asarray(v.detach().cpu().numpy()) if hasattr(
                v, "detach") else np.asarray(v)
                for k, v in torch.load(
                    args.stats_path, map_location="cpu").items()}
        dataset_mat = np.asarray(
            st["denoised_reduct_mat_full"], np.float32).reshape(
                wrapper.n_output_dims, 3)
        standard_vec = np.asarray(
            st["denoised_standard_mapping"], np.float32).reshape(
                wrapper.n_output_dims)
        # color range for the combined panel from the clip sample
        proj = stat_feats @ dataset_mat
        pca_stats = (dataset_mat, proj.min(0), proj.max(0))
    else:
        pca_stats = get_robust_pca(stat_feats)
        dataset_mat = np.asarray(pca_stats[0], np.float32)  # (C, 3)
        # "standard mapping" foreground direction (reference stats.pth
        # denoised_standard_mapping): the clip PCA's negated 2nd component
        standard_vec = -dataset_mat[:, 1]
    inferno = _cmap("inferno")

    scene = os.path.basename(os.path.normpath(args.frames_dir)) or "scene"
    png_dir = os.path.join(args.output_dir, scene, "images")
    os.makedirs(png_dir, exist_ok=True)

    def to_img(x01, hw):
        # reference order: quantize the map to uint8 at grid resolution,
        # then PIL BICUBIC upsample (Image.resize(..., BICUBIC),
        # make_video_demo.py items 2-9) - bilinear differed at every
        # upsampled pixel
        u8 = (np.clip(np.asarray(x01, np.float32), 0, 1)
              * 255).astype(np.uint8)
        return resize_image(u8, hw)

    def norm01(x, axis=0):
        lo = x.min(axis=axis, keepdims=True)
        hi = x.max(axis=axis, keepdims=True)
        return (x - lo) / np.maximum(hi - lo, 1e-8)

    videos = {k: [] for k in (
        "image", "instance_pca", "dataset_pca", "kmeans", "first_pca",
        "second_pca", "third_pca", "fg_pca", "fg_pca_standard", "norm",
        "features", "side_by_side",
    )}
    instance_mat = kmeans_centers = fg_reduct = fg_reduct_std = None

    for i, path in enumerate(frames):
        img, feats = frame_feats(path)
        hw = img.shape[:2]
        gh, gw, C = feats.shape
        flat = feats.reshape(-1, C)

        if i == 0:
            instance_mat = np.asarray(get_robust_pca(flat, m=2.0)[0])
            kmeans_centers = np.asarray(cosine_kmeans_fit(
                jax.random.PRNGKey(0), jnp.asarray(flat), args.num_clusters
            ))

        frame_out = {}
        frame_out["image"] = img.astype(np.uint8)
        # instance + dataset PCA (frame-level min/max normalization)
        pca_inst = norm01(flat @ instance_mat).reshape(gh, gw, 3)
        frame_out["instance_pca"] = to_img(pca_inst, hw)
        pca_full = flat @ dataset_mat
        frame_out["dataset_pca"] = to_img(norm01(pca_full).reshape(gh, gw, 3), hw)
        # kmeans predicted with frame-0 centers, rainbow colormap
        labels = np.asarray(
            cosine_kmeans_predict(jnp.asarray(flat), jnp.asarray(kmeans_centers))
        ).reshape(gh, gw)
        frame_out["kmeans"] = to_img(
            _cmap("rainbow")(labels / float(args.num_clusters))[..., :3], hw)
        # single components through inferno (2nd is sign-flipped, :158)
        for name, comp in (("first_pca", pca_full[:, 0]),
                           ("second_pca", 1 - pca_full[:, 1]),
                           ("third_pca", pca_full[:, 2])):
            c01 = norm01(comp.reshape(-1, 1))[:, 0].reshape(gh, gw)
            frame_out[name] = to_img(inferno(c01)[..., :3], hw)
        # foreground PCA splits (masks + frame-0 lowrank PCA, :176-211)
        for name, mask in (
            # RAW projection threshold (reference: 1 - pca_full[...,1]
            # > 0.1, no normalization - make_video_demo.py:177)
            ("fg_pca", (1 - pca_full[:, 1]) > 0.1),
            ("fg_pca_standard", flat @ standard_vec > 0),
        ):
            if i == 0:
                # SVD needs >= 3 foreground pixels for a (C, 3) basis
                fg = flat[mask] if int(mask.sum()) >= 3 else flat
                _, _, vt = np.linalg.svd(fg - fg.mean(0), full_matrices=False)
                reduct = vt[:3].T
                if name == "fg_pca":
                    fg_reduct = reduct
                else:
                    fg_reduct_std = reduct
            reduct = fg_reduct if name == "fg_pca" else fg_reduct_std
            fg01 = norm01(flat @ reduct) * mask[:, None]
            frame_out[name] = to_img(fg01.reshape(gh, gw, 3), hw)
        # feature-norm heatmap with the reference's softmax/5 contrast
        n_ = np.linalg.norm(flat, axis=-1)
        sm = np.exp(n_ / 5 - (n_ / 5).max())
        sm = sm / sm.sum()
        frame_out["norm"] = to_img(
            inferno(norm01(sm.reshape(-1, 1))[:, 0].reshape(gh, gw))[..., :3],
            hw,
        )
        # combined panel (image | dataset pca | kmeans | norm)
        panel = hcat(
            img.astype(np.float32) / 255.0,
            get_pca_map(feats, hw, pca_stats=pca_stats),
            get_cluster_map(feats, hw, args.num_clusters),
            get_scale_map(feats, hw),
        )
        frame_out["features"] = (np.clip(panel, 0, 1) * 255).astype(np.uint8)
        if denoiser is not None:
            _, raw_feats = frame_feats(path, raw_fn, raw_params)
            side = hcat(
                img.astype(np.float32) / 255.0,
                get_pca_map(raw_feats, hw, pca_stats=pca_stats),
                get_pca_map(feats, hw, pca_stats=pca_stats),
            )
            frame_out["side_by_side"] = (
                np.clip(side, 0, 1) * 255
            ).astype(np.uint8)

        for name, arr in frame_out.items():
            videos[name].append(arr)
            if name not in ("features", "side_by_side"):
                from PIL import Image

                suffix = "input" if name == "image" else name
                Image.fromarray(arr).save(
                    os.path.join(png_dir, f"{i:02d}_{suffix}.png")
                )

    written = []
    for name, seq in videos.items():
        if not seq:
            continue
        written.append(write_video(
            os.path.join(args.output_dir, scene, f"{name}.mp4"), seq, args.fps
        ))
    print(f"wrote {len(written)} videos x {len(frames)} frames under "
          f"{os.path.join(args.output_dir, scene)}")


if __name__ == "__main__":
    main()
