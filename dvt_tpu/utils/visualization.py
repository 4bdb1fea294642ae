"""Feature visualization: PCA / cluster / norm / similarity maps + panels.

NumPy/JAX rebuild of dvt/utils/visualization/visualization_tools.py and the
layout helpers (layout.py/annotation.py): outlier-robust 3-component PCA
coloring (:14-45), L2-norm heatmaps (:64-76), center-patch cosine similarity
(:79-111), cosine k-means clusters (:114-123, via utils/kmeans.py instead of
torch_kmeans), and the 12-column stage-1 / 7-column stage-2 panel composers
(:126-275). Images are float arrays in [0,1]; nearest-neighbor upsampling to
pixel resolution; matplotlib supplies colormaps only.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from dvt_tpu.utils.kmeans import cosine_kmeans


# ---------- low-level helpers ----------

def _cmap(name: str, n: Optional[int] = None):
    import matplotlib

    cm = matplotlib.colormaps[name]
    return cm if n is None else cm.resampled(n)


def _nearest_resize(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """(h, w, ...) -> (H, W, ...) nearest-neighbor."""
    h, w = img.shape[:2]
    ys = (np.arange(size[0]) * h // size[0]).clip(0, h - 1)
    xs = (np.arange(size[1]) * w // size[1]).clip(0, w - 1)
    return img[ys][:, xs]


def _bilinear_resize(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    h, w = img.shape[:2]
    ys = (np.arange(size[0]) + 0.5) * h / size[0] - 0.5
    xs = (np.arange(size[1]) + 0.5) * w / size[1] - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    ty = np.clip(ys - y0, 0, 1)[:, None]
    tx = np.clip(xs - x0, 0, 1)[None, :]
    if img.ndim == 3:
        ty = ty[..., None]
        tx = tx[..., None]
    top = img[y0][:, x0] * (1 - tx) + img[y0][:, x1] * tx
    bot = img[y1][:, x0] * (1 - tx) + img[y1][:, x1] * tx
    return top * (1 - ty) + bot * ty


# ---------- feature maps ----------

def get_robust_pca(features: np.ndarray, m: float = 2.0):
    """(N, C) -> (reduction (C, 3), rgb_min (3,), rgb_max (3,)).

    PCA via SVD on centered-free features (matching torch.pca_lowrank usage),
    then median/MAD outlier rejection for the color range (:14-45).
    """
    features = np.asarray(features, np.float32)
    assert features.ndim == 2
    # torch.pca_lowrank defaults to center=True: the BASIS comes from the
    # mean-centered matrix; the reference then projects the UNcentered
    # features through it (visualization_tools.py:18-19) - match both
    _, _, vt = np.linalg.svd(features - features.mean(0, keepdims=True),
                             full_matrices=False)
    reduction = vt[:3].T  # (C, 3)
    colors = features @ reduction
    d = np.abs(colors - np.median(colors, axis=0))
    mdev = np.median(d, axis=0) + 1e-12
    s = d / mdev
    rgb_min = np.empty(3, np.float32)
    rgb_max = np.empty(3, np.float32)
    for k in range(3):
        ins = colors[s[:, k] < m, k]
        if ins.size == 0:
            ins = colors[:, k]
        rgb_min[k] = ins.min()
        rgb_max[k] = ins.max()
    return reduction, rgb_min, rgb_max


def get_pca_map(feat_map: np.ndarray, img_size: Tuple[int, int],
                return_pca_stats: bool = False, pca_stats=None) -> np.ndarray:
    """(h, w, C) -> (H, W, 3) PCA false-color image in [0,1]."""
    feat_map = np.asarray(feat_map, np.float32)
    if feat_map.ndim == 4:
        feat_map = feat_map[0]
    flat = feat_map.reshape(-1, feat_map.shape[-1])
    if pca_stats is None:
        stats = get_robust_pca(flat)
    else:
        stats = pca_stats
    reduction, cmin, cmax = stats
    colors = (flat @ reduction - cmin) / (cmax - cmin + 1e-12)
    colors = colors.clip(0, 1).reshape(*feat_map.shape[:2], 3)
    out = _nearest_resize(colors, img_size)
    if return_pca_stats:
        return out, stats
    return out


def get_scale_map(feat_map: np.ndarray, img_size: Tuple[int, int]) -> np.ndarray:
    """L2-norm heatmap through the inferno colormap (:64-76)."""
    feat_map = np.asarray(feat_map, np.float32)
    if feat_map.ndim == 4:
        feat_map = feat_map[0]
    norms = np.linalg.norm(feat_map, axis=-1)
    norms = (norms - norms.min()) / (norms.max() - norms.min() + 1e-6)
    norms = _nearest_resize(norms, img_size)
    return _cmap("inferno")(norms)[..., :3]


def get_similarity_map(feat_map: np.ndarray,
                       img_size: Tuple[int, int] = (224, 224)) -> np.ndarray:
    """Cosine similarity of the center patch to all patches (:79-111);
    the center pixel is painted red like the reference."""
    feat_map = np.asarray(feat_map, np.float32)
    if feat_map.ndim == 4:
        feat_map = feat_map[0]
    h, w, c = feat_map.shape
    center = feat_map[h // 2, w // 2]
    center = center / (np.linalg.norm(center) + 1e-12)
    flat = feat_map.reshape(-1, c)
    flat = flat / (np.linalg.norm(flat, axis=1, keepdims=True) + 1e-12)
    sim = (flat @ center).reshape(h, w)
    sim = (sim - sim.min()) / (sim.max() - sim.min() + 1e-12)
    # -1 sentinel set BEFORE upsampling, exactly like the reference
    # (visualization_tools.py:98-100) - the red center marker therefore
    # bleeds into interpolated neighbors; kept for output parity
    sim[h // 2, w // 2] = -1.0
    sim = _bilinear_resize(sim, img_size)
    neg = sim < 0
    rgb = _cmap("turbo")(sim.clip(0, 1))[..., :3]
    rgb[neg] = [1.0, 0.0, 0.0]
    return rgb


def get_cluster_map(feat_map: np.ndarray, img_size: Tuple[int, int],
                    num_clusters: int = 10, seed: int = 0) -> np.ndarray:
    """Cosine k-means labels through the rainbow colormap (:114-123)."""
    feat_map = np.asarray(feat_map, np.float32)
    if feat_map.ndim == 4:
        feat_map = feat_map[0]
    h, w, c = feat_map.shape
    labels = np.asarray(
        cosine_kmeans(
            jax.random.PRNGKey(seed), feat_map.reshape(-1, c), num_clusters
        )
    ).reshape(h, w)
    labels = _nearest_resize(labels, img_size)
    return _cmap("rainbow")(labels / max(num_clusters - 1, 1))[..., :3]


# ---------- layout ----------

def hcat(*imgs: np.ndarray, gap: int = 12, gap_value: float = 1.0) -> np.ndarray:
    h = max(i.shape[0] for i in imgs)
    parts = []
    for k, im in enumerate(imgs):
        if im.shape[0] != h:
            pad = np.full((h - im.shape[0], im.shape[1], 3), gap_value, im.dtype)
            im = np.concatenate([im, pad], axis=0)
        parts.append(im)
        if k != len(imgs) - 1:
            parts.append(np.full((h, gap, 3), gap_value, im.dtype))
    return np.concatenate(parts, axis=1)


def vcat(*imgs: np.ndarray, gap: int = 12, gap_value: float = 1.0) -> np.ndarray:
    w = max(i.shape[1] for i in imgs)
    parts = []
    for k, im in enumerate(imgs):
        if im.shape[1] != w:
            pad = np.full((im.shape[0], w - im.shape[1], 3), gap_value, im.dtype)
            im = np.concatenate([im, pad], axis=1)
        parts.append(im)
        if k != len(imgs) - 1:
            parts.append(np.full((gap, w, 3), gap_value, im.dtype))
    return np.concatenate(parts, axis=0)


def add_border(img: np.ndarray, width: int = 8, value: float = 1.0) -> np.ndarray:
    h, w, c = img.shape
    out = np.full((h + 2 * width, w + 2 * width, c), value, img.dtype)
    out[width:-width, width:-width] = img
    return out


# the reference renders panel labels with its bundled Inter font
# (annotation.py:19-53, demo/assets/Inter-Regular.otf) - use it when the
# checkout is present, else PIL's default
_INTER_FONT = "/root/reference/demo/assets/Inter-Regular.otf"


def add_label(img: np.ndarray, text: str, font_size: int = 24) -> np.ndarray:
    """Render a text strip above the image (Inter font when available)."""
    from PIL import Image, ImageDraw

    h, w, _ = img.shape
    strip_h = font_size + 10
    strip = Image.new("RGB", (w, strip_h), (255, 255, 255))
    draw = ImageDraw.Draw(strip)
    try:
        from PIL import ImageFont

        if os.path.isfile(_INTER_FONT):
            font = ImageFont.truetype(_INTER_FONT, size=font_size)
        else:
            font = ImageFont.load_default(size=font_size)
    except Exception:
        font = None
    draw.text((4, 2), text, fill=(0, 0, 0), font=font)
    strip_np = np.asarray(strip, np.float32) / 255.0
    return np.concatenate([strip_np, img], axis=0)


# ---------- panels ----------

def _to01(img: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img, np.float32), 0.0, 1.0)


def visualize_offline_denoised_samples(
    decompositions: Sequence[Dict[str, np.ndarray]],
    images: Sequence[np.ndarray],
    labels: bool = True,
) -> np.ndarray:
    """Stage-1 panel (12 columns, reference :126-226): input image; raw
    feature PCA/cluster/norm/similarity; denoised PCA/cluster/norm/
    similarity; shared-artifact PCA; residual norm; composited G+h PCA.

    decompositions: per-sample dicts from decompose_full_image (keys
    raw_vit_outputs, denoised_feats, shared_patterns, optionally
    pred_residual / shared_patterns_and_residual).
    images: matching denormalized (H, W, 3) arrays in [0, 1].
    Returns a uint8 panel image.
    """
    rows = []
    names = [
        "Input Image", "Original Feature", "Original Cluster", "Original Norm",
        "Original Sim", "Denoised Feat (F)", "Denoised Cluster",
        "Denoised Norm", "Denoised Sim", "Shared Noise (G)",
        "Residual Norm (h)", "Composited (G+h)",
    ]
    for k, (dec, img) in enumerate(zip(decompositions, images)):
        hw = img.shape[:2]
        raw = np.asarray(dec["raw_vit_outputs"], np.float32)
        den = np.asarray(dec["denoised_feats"], np.float32)
        shared = np.asarray(dec["shared_patterns"], np.float32)
        cols = [
            _to01(img),
            get_pca_map(raw, hw),
            get_cluster_map(raw, hw, 5),
            get_scale_map(raw, hw),
            get_similarity_map(raw, hw),
            get_pca_map(den, hw),
            get_cluster_map(den, hw, 5),
            get_scale_map(den, hw),
            get_similarity_map(den, hw),
            get_pca_map(shared, hw),
        ]
        if "pred_residual" in dec:
            cols.append(get_scale_map(np.asarray(dec["pred_residual"]), hw))
            cols.append(
                get_pca_map(
                    np.asarray(dec["shared_patterns_and_residual"]), hw
                )
            )
        if labels and k == 0:
            cols = [add_label(c, n) for c, n in zip(cols, names)]
        rows.append(hcat(*cols))
    panel = add_border(vcat(*rows))
    return (panel * 255).astype(np.uint8)


def visualize_online_denoised_samples(
    images: np.ndarray,
    original_feats: np.ndarray,
    gt_denoised_feats: np.ndarray,
    pred_denoised_feats: np.ndarray,
    num_samples: int = 5,
    labels: bool = True,
) -> np.ndarray:
    """Stage-2/3 panel (7 columns, reference :229-275): image, original
    PCA/norm, GT denoised PCA/norm, predicted denoised PCA/norm - prediction
    colored with the GT PCA basis so columns are comparable."""
    rows = []
    names = [
        "Input Image", "Original Feature", "Original Norm", "GT Denoised",
        "GT Denoised Norm", "Pred Denoised", "Pred Deno. Norm",
    ]
    n = min(num_samples, len(images))
    for k in range(n):
        img = _to01(images[k])
        hw = img.shape[:2]
        gt_color, stats = get_pca_map(
            gt_denoised_feats[k], hw, return_pca_stats=True
        )
        cols = [
            img,
            get_pca_map(original_feats[k], hw),
            get_scale_map(original_feats[k], hw),
            gt_color,
            get_scale_map(gt_denoised_feats[k], hw),
            get_pca_map(pred_denoised_feats[k], hw, pca_stats=stats),
            get_scale_map(pred_denoised_feats[k], hw),
        ]
        if labels and k == 0:
            cols = [add_label(c, nm) for c, nm in zip(cols, names)]
        rows.append(hcat(*cols))
    panel = add_border(vcat(*rows))
    return (panel * 255).astype(np.uint8)
