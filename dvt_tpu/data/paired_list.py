"""Stage-2 dataset: (image, raw .npy, stage-1 denoised .npy) triplets.

Rebuilds dvt/dataset/paired_list_dataset.py: image paths from a list file;
feature paths derived by data_root -> feat_root substitution with
``denoised_features`` <-> ``raw_features`` swapping (:30-37); a missing
feature file resamples a random index (:31-32) so partially-finished stage-1
runs still train.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from dvt_tpu.data.single_image import load_image, resize_image


class PairedListDataset:
    def __init__(
        self,
        data_root: str,
        data_list: str,
        feat_root: str,
        input_size: Tuple[int, int] = (518, 518),
        mean=(0.485, 0.456, 0.406),
        std=(0.229, 0.224, 0.225),
        seed: int = 0,
        include_image: bool = True,
    ):
        self.data_root = data_root
        self.feat_root = feat_root
        self.input_size = tuple(input_size)
        # The train step consumes ONLY the feature pair (stage2.py
        # denoise_loss); the reference decodes + resizes the image every
        # batch anyway because its vis panels reuse the batch tensors
        # (main_denoiser.py:214-217 uses feats; samples carry the image).
        # include_image=False skips JPEG decode + 518^2 bicubic per sample
        # — the dominant host cost on few-core TPU hosts (tools/
        # ab_overlap.py) — and returns the sample "index" instead so vis
        # steps can fetch just their few images via image_for_index().
        self.include_image = include_image
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        with open(data_list) as f:
            self.img_paths = [ln.strip().split(" ")[0] for ln in f if ln.strip()]
        self._seed = seed
        self._feat_shape = None  # probed lazily for the native batch path
        import itertools
        # per-call RNG (thread-safe under the threaded DataLoader)
        self._draw = itertools.count()

    def __len__(self) -> int:
        return len(self.img_paths)

    def _denoised_path(self, rel: str) -> str:
        # splitext-based: str.replace(ext, ...) would hit the FIRST
        # occurrence of the extension substring anywhere in the path
        return os.path.join(self.feat_root, os.path.splitext(rel)[0] + ".npy")

    def _resolve(self, index: int) -> Tuple[int, str, str, str]:
        """-> (resolved index, rel image path, raw .npy, denoised .npy).

        BOTH feature files must exist; otherwise resample a random index
        (reference resample-on-missing, paired_list_dataset.py:31-32) so
        partially-finished stage-1 runs still train. The RESOLVED index is
        returned (it may differ from the requested one after resampling)
        so include_image=False consumers can fetch the matching image."""
        for _ in range(len(self.img_paths)):
            rel = self.img_paths[index]
            denoised_pth = self._denoised_path(rel)
            raw_pth = denoised_pth.replace("denoised_features",
                                           "raw_features")
            if os.path.exists(denoised_pth) and os.path.exists(raw_pth):
                return index, rel, raw_pth, denoised_pth
            rng = np.random.default_rng(
                (self._seed, index, next(self._draw)))
            index = int(rng.integers(len(self.img_paths)))
        raise FileNotFoundError(
            f"no stage-1 features found under {self.feat_root}"
        )

    def _load_image(self, rel: str) -> np.ndarray:
        img = load_image(os.path.join(self.data_root, rel))
        img = resize_image(img, self.input_size).astype(np.float32) / 255.0
        return (img - self.mean) / self.std

    def image_for_index(self, index: int) -> np.ndarray:
        """Decode one RESOLVED sample's image on demand (vis steps when
        the train loader runs with include_image=False). ``index`` is the
        value the batch's "index" field carried, i.e. already resolved —
        no resample loop here."""
        return self._load_image(self.img_paths[index])

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        index, rel, raw_pth, denoised_pth = self._resolve(index)
        out = {
            "original_feats": np.load(raw_pth).squeeze().astype(np.float32),
            "denoised_feats": np.load(denoised_pth).squeeze().astype(np.float32),
        }
        if self.include_image:
            out["image"] = self._load_image(rel)
        else:
            out["index"] = np.asarray(index, np.int32)
        return out

    def get_batch(self, indices) -> Dict[str, np.ndarray]:
        """Whole-batch fast path through the native C++ loader: JPEG
        decode + AA-bicubic resize + normalize plus both .npy feature
        reads per sample, one OpenMP region, GIL released (the threaded
        Python path serializes on the GIL around PIL/np.load on few-core
        hosts). Returns None when unavailable (non-JPEG input, missing
        library, unsupported .npy dtype) — the DataLoader then falls back
        to per-item ``__getitem__``. Images differ from the PIL path by
        PIL's OWN two-pass uint8 fixed-point resize (up to ~26/255 on
        high-frequency content); the native resize is float-exact vs
        torch antialias=True (~1e-2 levels, tools/ab_loader.py)."""
        from dvt_tpu.data.native import (load_npy_batch_native,
                                         load_paired_batch_native)

        resolved = [self._resolve(i) for i in indices]
        if self._feat_shape is None:
            probe = np.load(resolved[0][2], mmap_mode="r")
            self._feat_shape = tuple(np.squeeze(probe).shape)
        imgs = None
        idx_arr = np.asarray([ri for ri, _, _, _ in resolved], np.int32)
        if self.include_image:
            out = load_paired_batch_native(
                [os.path.join(self.data_root, rel)
                 for _, rel, _, _ in resolved],
                [r for _, _, r, _ in resolved],
                [d for _, _, _, d in resolved],
                self.input_size, self.mean, self.std, self._feat_shape,
            )
            if out is None:
                return None  # library unavailable: caller disables fast path
            imgs, raw, den, status = out
        else:
            # feature-only batches: one native npy read over the
            # interleaved (raw, denoised) path list, no image decode
            out = load_npy_batch_native(
                [p for pair in ((r, d) for _, _, r, d in resolved)
                 for p in pair],
                self._feat_shape,
            )
            if out is None:
                return None
            both, status2 = out
            raw = np.ascontiguousarray(both[0::2])
            den = np.ascontiguousarray(both[1::2])
            # a sample fails if EITHER of its two files failed
            status = np.maximum(status2[0::2], status2[1::2])
        if status.all():
            # every sample failed -> format-level incompatibility (e.g. a
            # PNG dataset): report as a capability miss so the DataLoader
            # stops paying the native probe each batch
            return None
        if status.any():
            # transient per-file failures (e.g. a feature .npy mid-write
            # by a concurrent stage-1 dump, the resample-on-missing
            # scenario _resolve supports): retry just those samples via
            # the Python path; if a retry is unreadable or wrong-shaped,
            # resample a different index (the reference's missing-file
            # semantics, paired_list_dataset.py:31-32) instead of
            # abandoning the fast path for the whole run
            for i in np.nonzero(status)[0]:
                idx, item = int(indices[i]), None
                for _ in range(len(self.img_paths)):
                    try:
                        cand = self.__getitem__(idx)
                    except Exception:
                        cand = None
                    if (cand is not None
                            and cand["original_feats"].shape == raw.shape[1:]
                            and cand["denoised_feats"].shape == den.shape[1:]
                            and (imgs is None
                                 or cand["image"].shape == imgs.shape[1:])):
                        item = cand
                        break
                    rng = np.random.default_rng(
                        (self._seed, idx, next(self._draw)))
                    idx = int(rng.integers(len(self.img_paths)))
                if item is None:
                    raise RuntimeError(
                        f"no loadable stage-2 sample found under "
                        f"{self.feat_root} after resampling")
                if imgs is not None:
                    imgs[i] = item["image"]
                else:
                    idx_arr[i] = item["index"]
                raw[i] = item["original_feats"]
                den[i] = item["denoised_feats"]
        out = {"original_feats": raw, "denoised_feats": den}
        if imgs is not None:
            out["image"] = imgs
        else:
            out["index"] = idx_arr
        return out
