"""Stage-1 end-to-end engine: images in, denoised feature maps out.

Pipeline per image batch (all device-side after one base-image upload each):

  base image --(render_crops: bicubic crop kernel)--> 768 views
             --(ViT forward, intermediate tap)------> raw features
             --(jit(vmap(fit_one_image)))-----------> denoised features

vs. the reference (main_img_denoising.py): host-side torchvision crops for
768 views, H2D copy per view batch, one image per GPU process. Here the only
host->device traffic is one (518, 518, 3) image; extraction renders + embeds
in the same XLA program; and N images' 25k-step fits run concurrently per
chip under vmap.

Output layout matches the reference's .npy dumps (main_img_denoising.py:
131-143): <save_root>/{raw,denoised}_features/<model>/<rel>.npy, each
(h, w, C) float32, and the same skip-if-done resume check (misc.py:325-337).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dvt_tpu.data.crops import render_crops, view_coordinate_grids
from dvt_tpu.data.single_image import SingleImagePipeline
from dvt_tpu.models.vit import ViTWrapper
from dvt_tpu.stage1 import (
    Stage1Config,
    fit_image_batch_chunked,
    make_patch_coordinates,
)

Array = jax.Array


@dataclasses.dataclass
class Stage1Engine:
    model_identifier: str = "vit_base_patch14_dinov2.lvd142m"
    stride: int = 14
    input_size: Tuple[int, int] = (518, 518)
    layer_depth_ratio: float = 1.0
    num_views: int = 768
    num_iters: int = 25000
    warmup_iters: int = 2500
    n_levels: int = 16
    pixel_bsz: int = 2048
    extract_bsz: int = 128  # measured default (tools/ab_extract.py:
    # 4.37 -> 3.64 s/768 views at feature cosine 1.0); clamped below to
    # the largest divisor of num_views
    images_per_batch: int = 1  # max vmap width per fit dispatch;
    # denoise_batch chunks larger inputs into groups of this size.
    # 1 is the measured per-chip throughput optimum (RESULTS.md 9d:
    # vmapped fits are ~94% per-image efficient, so in-chip concurrency
    # never beats sequential fits); raise only to amortize dispatches
    fit_chunk_iters: int = 5000  # steps per dispatch (watchdog-friendly)
    feature_dtype: str = "bfloat16"  # pool storage dtype
    moments_dtype: str = "bfloat16"  # Adam moment storage in the fit
    optimizer_impl: str = "fused"  # "fused" Pallas Adam | "optax" oracle
    matmul_level_threshold: int = 4096  # one-hot-matmul levels cutoff
    stochastic_corners: bool = False  # 1-corner sampling on gather levels
    table_sweep_every: int = 1  # K-step deferred hash-table Adam sweep
    level_sample: int = 0  # level dropout: gather levels sampled per step
    vit_dtype: str = "bfloat16"
    extract_attention: str = "einsum"  # "flash": Pallas kernel in the
    # extraction ViT forward (1369 tokens at 518/str14) — A/B'd by
    # tools/ab_extract.py
    vit_params: Optional[dict] = None
    checkpoint_path: Optional[str] = None
    seed: int = 0

    def __post_init__(self):
        if self.fit_chunk_iters <= 0:
            raise ValueError(
                f"fit_chunk_iters={self.fit_chunk_iters} must be positive "
                "(a 0-length chunk would loop forever in the chunked fit)")
        k = self.table_sweep_every
        if k > 1:
            if self.num_iters % k:
                raise ValueError(
                    f"num_iters={self.num_iters} must be divisible by "
                    f"table_sweep_every={k}")
            # chunk boundaries must land on sweep boundaries; never floor
            # to 0 (a 0-length chunk would loop forever in the chunked fit)
            self.fit_chunk_iters = max(
                self.fit_chunk_iters - self.fit_chunk_iters % k, k
            )
        self.vit = ViTWrapper(
            self.model_identifier,
            stride=self.stride,
            params=self.vit_params,
            checkpoint_path=self.checkpoint_path,
            dtype=jnp.dtype(self.vit_dtype),
            attention_impl=self.extract_attention,
            seed=self.seed,
        )
        self.layer_index = int(
            self.layer_depth_ratio * self.vit.last_layer_index
        )
        gh, gw = self.vit.feat_grid(*self.input_size)
        self.feat_hw = (gh, gw)
        self.cfg = Stage1Config(
            feat_dim=self.vit.n_output_dims,
            noise_map_height=gh,
            noise_map_width=gw,
            n_levels=self.n_levels,
            num_views=self.num_views,
            num_iters=self.num_iters,
            warmup_iters=self.warmup_iters,
            pixel_bsz=self.pixel_bsz,
            moments_dtype=jnp.dtype(self.moments_dtype),
            optimizer_impl=self.optimizer_impl,
            matmul_level_threshold=self.matmul_level_threshold,
            stochastic_corners=self.stochastic_corners,
            table_sweep_every=self.table_sweep_every,
            level_sample=self.level_sample,
        )
        self.pipeline = SingleImagePipeline(
            size=self.input_size,
            num_views=self.num_views,
            mean=self.vit.cfg.mean,
            std=self.vit.cfg.std,
            seed=self.seed,
        )
        self._pool_dtype = jnp.dtype(self.feature_dtype)
        if self.num_views % self.extract_bsz:
            # The extraction chunk width is an implementation detail
            # (lax.map chunking - features are bit-identical at any
            # width), so round down to the largest divisor rather than
            # reject valid --num_views values (e.g. 192 with the
            # measured-default 128).
            bsz = min(self.extract_bsz, self.num_views)
            while self.num_views % bsz:
                bsz -= 1
            self.extract_bsz = bsz
        self._extract_all = jax.jit(self._extract_all_fn)

    # --- device-side extraction: render crops + ViT forward + coords for a
    # whole image batch in ONE dispatch (lax.map over view chunks keeps the
    # rendered-view working set at extract_bsz) ---
    def _extract_all_fn(self, params, bases: Array, boxes: Array, flips: Array):
        """bases (N, H, W, 3); boxes (N, V, 4); flips (N, V) ->
        feats (N, V+1, h, w, C) pool-dtype, coords (N, V+1, h, w, 2)."""
        n = bases.shape[0]
        nchunks = self.num_views // self.extract_bsz
        vit_dtype = jnp.dtype(self.vit_dtype)

        def chunk_fn(args):
            img_idx, cboxes, cflips = args
            base = bases[img_idx]
            views = render_crops(base, cboxes, cflips, self.input_size)
            feats = self.vit.module.apply(
                {"params": params},
                views.astype(vit_dtype),
                indices=[self.layer_index],
                norm=True,
            )[-1]
            return feats.astype(self._pool_dtype)

        img_ids = jnp.repeat(jnp.arange(n), nchunks)
        boxes_c = boxes.reshape(n * nchunks, self.extract_bsz, 4)
        flips_c = flips.reshape(n * nchunks, self.extract_bsz)
        feats = jax.lax.map(chunk_fn, (img_ids, boxes_c, flips_c))
        feats = feats.reshape(n, self.num_views, *self.feat_hw, -1)

        full = self.vit.module.apply(
            {"params": params},
            bases.astype(vit_dtype),
            indices=[self.layer_index],
            norm=True,
        )[-1].astype(self._pool_dtype)
        feats = jnp.concatenate([feats, full[:, None]], axis=1)

        coords = jax.vmap(
            lambda b, f: view_coordinate_grids(b, f, self.feat_hw, self.input_size)
        )(boxes, flips)
        full_coords = make_patch_coordinates(*self.feat_hw, 0.0, 1.0)
        full_coords = jnp.broadcast_to(full_coords[None, None], (n, 1, *self.feat_hw, 2))
        coords = jnp.concatenate([coords.astype(jnp.float32), full_coords], axis=1)
        return feats, coords

    def extract_image(self, path_or_array):
        """-> (raw_features (V+1, h, w, C), coords (V+1, h, w, 2)) on device."""
        feats, coords = self.extract_batch([path_or_array])
        return feats[0], coords[0]

    def extract_batch(self, inputs: Sequence, return_bases: bool = False):
        bases, boxes, flips = [], [], []
        for item in inputs:
            b, bx, fl = self.pipeline.prepare(item)
            bases.append(b)
            boxes.append(bx)
            flips.append(fl)
        bases = np.stack(bases)
        feats, coords = self._extract_all(
            self.vit.params,
            jnp.asarray(bases),
            jnp.asarray(np.stack(boxes)),
            jnp.asarray(np.stack(flips)),
        )
        if return_bases:
            return feats, coords, bases
        return feats, coords

    def denoise_batch(self, inputs: Sequence) -> Tuple[np.ndarray, np.ndarray, dict]:
        """Fit a batch of images concurrently.

        inputs: paths or arrays; more than ``images_per_batch`` of them
        are fitted in groups of that size (a too-wide vmap of 25k-step
        fits is both slower per image - PLAN.md 0b - and an OOM risk).
        Returns (raw (N, h, w, C), denoised (N, h, w, C), metrics).
        """
        m = self.images_per_batch
        if len(inputs) > m:
            outs = [self.denoise_batch(inputs[i:i + m])
                    for i in range(0, len(inputs), m)]
            return (
                np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]),
                jax.tree.map(lambda *xs: np.concatenate(xs),
                             *[o[2] for o in outs]),
            )
        raw_b, crd_b = self.extract_batch(inputs)
        keys = jax.random.split(
            jax.random.PRNGKey(self.seed), len(inputs)
        )
        denoised, metrics = fit_image_batch_chunked(
            keys, raw_b, crd_b, self.cfg, self.fit_chunk_iters
        )
        raw_full = np.asarray(raw_b[:, -1].astype(jnp.float32))
        return raw_full, np.asarray(denoised), jax.tree.map(np.asarray, metrics)

    def denoise_batch_with_vis(self, inputs: Sequence):
        """Like denoise_batch, but also renders the reference's 12-column
        decomposition panel per image (main_img_denoising.py:101-117)."""
        from dvt_tpu.stage1 import decompose_full_image
        from dvt_tpu.utils.visualization import (
            visualize_offline_denoised_samples,
        )

        # bases returned from the one prepare() pass: re-preparing per
        # image would re-decode AND advance the crop sampler's RNG,
        # making crop sequences depend on --vis_freq
        raw_b, crd_b, bases = self.extract_batch(inputs, return_bases=True)
        keys = jax.random.split(jax.random.PRNGKey(self.seed), len(inputs))
        denoised, metrics, params = fit_image_batch_chunked(
            keys, raw_b, crd_b, self.cfg, self.fit_chunk_iters,
            return_params=True,
        )
        panels = []
        for i in range(len(inputs)):
            p_i = jax.tree.map(lambda x, i=i: x[i], params)
            dec = decompose_full_image(
                p_i,
                self.cfg,
                raw_b[i, -1].astype(jnp.float32),
                crd_b[i, -1],
            )
            dec = jax.tree.map(np.asarray, dec)
            img01 = np.clip(
                bases[i] * np.asarray(self.vit.cfg.std)
                + np.asarray(self.vit.cfg.mean),
                0,
                1,
            )
            panels.append(
                visualize_offline_denoised_samples([dec], [img01])
            )
        raw_full = np.asarray(raw_b[:, -1].astype(jnp.float32))
        return (
            raw_full,
            np.asarray(denoised),
            jax.tree.map(np.asarray, metrics),
            panels,
        )

    # --- filesystem interface (stage-1 -> stage-2 contract) ---
    def feature_paths(self, save_root: str, data_root: str, img_path: str):
        raw_dir = os.path.join(save_root, "raw_features", self.model_identifier)
        den_dir = os.path.join(
            save_root, "denoised_features", self.model_identifier
        )
        rel = os.path.relpath(img_path, data_root) if data_root else os.path.basename(img_path)
        rel = os.path.splitext(rel)[0] + ".npy"
        return os.path.join(raw_dir, rel), os.path.join(den_dir, rel)

    def already_done(self, save_root: str, data_root: str, img_path: str) -> bool:
        raw_p, den_p = self.feature_paths(save_root, data_root, img_path)
        return os.path.isfile(raw_p) and os.path.isfile(den_p)

    def save_features(self, save_root: str, data_root: str, img_path: str,
                      raw: np.ndarray, denoised: np.ndarray):
        raw_p, den_p = self.feature_paths(save_root, data_root, img_path)
        os.makedirs(os.path.dirname(raw_p), exist_ok=True)
        os.makedirs(os.path.dirname(den_p), exist_ok=True)
        np.save(raw_p, raw.astype(np.float32))
        np.save(den_p, denoised.astype(np.float32))
        return raw_p, den_p
