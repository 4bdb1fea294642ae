"""Video demo generator: per-frame feature visualizations as mp4/gif.

TPU counterpart of the reference's make_video_demo.py: run a (optionally
distilled) backbone at a small stride over a frame directory and write
PCA / k-means / norm visualization videos, using dataset-level PCA/cluster
statistics computed from a sample of frames (reference uses precomputed
demo/assets/stats.pth; we compute stats on the fly from the clip).
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
    p.add_argument("--input_size", type=int, default=294)
    p.add_argument("--num_clusters", type=int, default=10)
    p.add_argument("--stats_frames", type=int, default=8,
                   help="frames used to fit shared PCA stats")
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
    )
    denoiser = denoiser_params = None
    if args.denoiser_ckpt:
        from main_distillation import load_denoiser_params

        denoiser_params = load_denoiser_params(args.denoiser_ckpt)
        denoiser = Denoiser(feat_dim=wrapper.n_output_dims, dtype=jnp.bfloat16)
    feature_fn, fparams = make_feature_fn(wrapper, denoiser, denoiser_params)

    size = (args.input_size, args.input_size)
    mean = np.asarray(wrapper.cfg.mean, np.float32)
    std = np.asarray(wrapper.cfg.std, np.float32)

    def frame_feats(path):
        img = resize_image(load_image(path), size)
        x = (img.astype(np.float32) / 255.0 - mean) / std
        f = feature_fn(fparams, jnp.asarray(x[None]))
        return img, np.asarray(f[0], np.float32)

    # dataset-level PCA stats from a frame sample (replaces stats.pth)
    sample = frames[:: max(len(frames) // args.stats_frames, 1)]
    stat_feats = np.concatenate(
        [frame_feats(p)[1].reshape(-1, wrapper.n_output_dims) for p in sample]
    )
    pca_stats = get_robust_pca(stat_feats)

    panels = []
    for path in frames:
        img, feats = frame_feats(path)
        hw = img.shape[:2]
        panel = hcat(
            img.astype(np.float32) / 255.0,
            get_pca_map(feats, hw, pca_stats=pca_stats),
            get_cluster_map(feats, hw, args.num_clusters),
            get_scale_map(feats, hw),
        )
        panels.append((np.clip(panel, 0, 1) * 255).astype(np.uint8))
    out = write_video(
        os.path.join(args.output_dir, "features.mp4"), panels, args.fps
    )
    print(f"wrote {out} ({len(panels)} frames)")


if __name__ == "__main__":
    main()
