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
    ):
        self.data_root = data_root
        self.feat_root = feat_root
        self.input_size = tuple(input_size)
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

    def _resolve(self, index: int) -> Tuple[str, str, str]:
        """-> (rel image path, raw .npy, denoised .npy) for a usable sample.

        BOTH feature files must exist; otherwise resample a random index
        (reference resample-on-missing, paired_list_dataset.py:31-32) so
        partially-finished stage-1 runs still train."""
        for _ in range(len(self.img_paths)):
            rel = self.img_paths[index]
            denoised_pth = self._denoised_path(rel)
            raw_pth = denoised_pth.replace("denoised_features",
                                           "raw_features")
            if os.path.exists(denoised_pth) and os.path.exists(raw_pth):
                return rel, raw_pth, denoised_pth
            rng = np.random.default_rng(
                (self._seed, index, next(self._draw)))
            index = int(rng.integers(len(self.img_paths)))
        raise FileNotFoundError(
            f"no stage-1 features found under {self.feat_root}"
        )

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rel, raw_pth, denoised_pth = self._resolve(index)
        img = load_image(os.path.join(self.data_root, rel))
        img = resize_image(img, self.input_size).astype(np.float32) / 255.0
        img = (img - self.mean) / self.std
        return {
            "image": img,
            "original_feats": np.load(raw_pth).squeeze().astype(np.float32),
            "denoised_feats": np.load(denoised_pth).squeeze().astype(np.float32),
        }

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
        from dvt_tpu.data.native import load_paired_batch_native

        resolved = [self._resolve(i) for i in indices]
        if self._feat_shape is None:
            probe = np.load(resolved[0][1], mmap_mode="r")
            self._feat_shape = tuple(np.squeeze(probe).shape)
        out = load_paired_batch_native(
            [os.path.join(self.data_root, rel) for rel, _, _ in resolved],
            [r for _, r, _ in resolved],
            [d for _, _, d in resolved],
            self.input_size, self.mean, self.std, self._feat_shape,
        )
        if out is None:
            return None  # library unavailable: caller disables fast path
        imgs, raw, den, status = out
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
                            and cand["image"].shape == imgs.shape[1:]):
                        item = cand
                        break
                    rng = np.random.default_rng(
                        (self._seed, idx, next(self._draw)))
                    idx = int(rng.integers(len(self.img_paths)))
                if item is None:
                    raise RuntimeError(
                        f"no loadable stage-2 sample found under "
                        f"{self.feat_root} after resampling")
                imgs[i] = item["image"]
                raw[i] = item["original_feats"]
                den[i] = item["denoised_feats"]
        return {"image": imgs, "original_feats": raw,
                "denoised_feats": den}
