"""Monocular-depth linear probe: binned BNHead + SigLoss/GradientLoss +
eigen-crop metrics.

TPU rebuild of the reference's depth eval fork (evaluation/depth/):
  * DepthBNHead: BatchNorm + 1x1 conv to 256 bins, "UD" uniform bins in
    [min_depth, max_depth], "linear" normalization (relu + 0.1 eps, sum-norm)
    and expectation over bin centers (models/decode_heads/decode_head.py:
    159-192). The class token is broadcast-concatenated with the patch map
    like eval_utils/misc.py:159-188 prepares inputs.
  * sig_loss: scale-invariant log loss sqrt(var(g) + 0.15 mean(g)^2) on
    valid (0 < gt <= max_depth) pixels (losses/sigloss.py:48-65).
  * gradient_loss: multi-scale log-gradient L1 (losses/gradientloss.py:33-63).
  * depth_metrics: a1/a2/a3, abs_rel, rmse, rmse_log, log10, silog, sq_rel
    (core/evaluation/metrics.py:8-47), with the NYU eigen crop
    (datasets/nyu.py:210-229: rows 45:471, cols 41:601).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dvt_tpu.eval.seg import bilinear_upsample, poly_schedule

Array = jax.Array


class DepthBNHead(nn.Module):
    n_bins: int = 256
    min_depth: float = 0.001
    max_depth: float = 10.0
    sync_axis: Optional[str] = None

    @nn.compact
    def __call__(self, feats: Array, train: bool = False) -> Array:
        """(B, h, w, C) -> (B, h, w) depth in [min_depth, max_depth]."""
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.sync_axis if train else None,
            name="bn",
        )(feats)
        logit = nn.Dense(self.n_bins, name="conv_depth")(x)
        # "linear" norm strategy (decode_head.py:174-178)
        logit = nn.relu(logit) + 0.1
        logit = logit / jnp.sum(logit, axis=-1, keepdims=True)
        bins = jnp.linspace(self.min_depth, self.max_depth, self.n_bins)
        return jnp.einsum("bhwk,k->bhw", logit, bins)


def sig_loss(pred: Array, gt: Array, max_depth: Optional[float] = None,
             eps: float = 0.001, lam: float = 0.15) -> Array:
    """Scale-invariant log loss over valid pixels (sigloss.py:48-65)."""
    valid = gt > 0
    if max_depth is not None:
        valid = valid & (gt <= max_depth)
    g = jnp.log(pred + eps) - jnp.log(gt + eps)
    n = jnp.maximum(jnp.sum(valid), 1)
    mean_g = jnp.sum(jnp.where(valid, g, 0.0)) / n
    var_g = jnp.sum(jnp.where(valid, (g - mean_g) ** 2, 0.0)) / n
    return jnp.sqrt(var_g + lam * mean_g**2)


def gradient_loss(pred: Array, gt: Array, max_depth: Optional[float] = None,
                  eps: float = 0.001) -> Array:
    """Multi-scale log-gradient loss (gradientloss.py:33-63). pred/gt are
    (H, W) maps (the reference applies it on squeezed 2-D maps)."""
    total = 0.0
    for i in range(4):
        s = 1 if i == 0 else 2 * i
        p = pred[::s, ::s]
        t = gt[::s, ::s]
        mask = t > 0
        if max_depth is not None:
            mask = mask & (t <= max_depth)
        n = jnp.maximum(jnp.sum(mask), 1)
        diff = (jnp.log(p + eps) - jnp.log(t + eps)) * mask
        v = jnp.abs(diff[:-2, :] - diff[2:, :]) * (mask[:-2, :] & mask[2:, :])
        h = jnp.abs(diff[:, :-2] - diff[:, 2:]) * (mask[:, :-2] & mask[:, 2:])
        total = total + (jnp.sum(v) + jnp.sum(h)) / n
    return total


def eigen_crop_mask(shape: Tuple[int, int],
                    crop: Tuple[int, int, int, int] = (45, 471, 41, 601)
                    ) -> np.ndarray:
    """NYU eval mask (nyu.py:210-229): True inside the eigen crop."""
    m = np.zeros(shape, bool)
    m[crop[0]:crop[1], crop[2]:crop[3]] = True
    return m


def depth_metrics(gt: np.ndarray, pred: np.ndarray, min_depth: float = 1e-3,
                  max_depth: float = 10.0,
                  eval_mask: Optional[np.ndarray] = None) -> Dict[str, float]:
    """Per-image metric dict (metrics.py:8-47)."""
    valid = (gt > min_depth) & (gt < max_depth)
    if eval_mask is not None:
        valid &= eval_mask
    gt = gt[valid]
    pred = pred[valid]
    if gt.size == 0:
        return {k: float("nan") for k in
                ("a1", "a2", "a3", "abs_rel", "rmse", "log_10", "rmse_log",
                 "silog", "sq_rel")}
    thresh = np.maximum(gt / pred, pred / gt)
    err = np.log(pred) - np.log(gt)
    silog = np.sqrt(np.mean(err**2) - np.mean(err) ** 2) * 100
    return {
        "a1": float((thresh < 1.25).mean()),
        "a2": float((thresh < 1.25**2).mean()),
        "a3": float((thresh < 1.25**3).mean()),
        "abs_rel": float(np.mean(np.abs(gt - pred) / gt)),
        "rmse": float(np.sqrt(np.mean((gt - pred) ** 2))),
        "log_10": float(np.mean(np.abs(np.log10(gt) - np.log10(pred)))),
        "rmse_log": float(np.sqrt(np.mean((np.log(gt) - np.log(pred)) ** 2))),
        "silog": 0.0 if np.isnan(silog) else float(silog),
        "sq_rel": float(np.mean((gt - pred) ** 2 / gt)),
    }


@dataclasses.dataclass
class DepthLinearProbe:
    """Frozen-backbone depth probe: feature_fn -> DepthBNHead, SigLoss x10 +
    GradientLoss x0.5 (vitb_nyu_linear_config.py recipe: AdamW lr 5e-3
    wd 0.1... the config uses lr=0.005/wd=0.005 variants; defaults here match
    the shipped config's optimizer block)."""

    feature_fn: Callable  # (images) -> feats, or (feature_params, images)
    feature_params: Any = None
    min_depth: float = 0.001
    max_depth: float = 10.0
    lr: float = 5e-3
    weight_decay: float = 0.005
    total_iters: int = 38_400
    warmup_iters: int = 1500
    sig_weight: float = 10.0
    grad_weight: float = 0.5
    seed: int = 0

    def __post_init__(self):
        self.head = DepthBNHead(
            min_depth=self.min_depth, max_depth=self.max_depth
        )
        self.schedule = poly_schedule(
            self.lr, self.total_iters, 0.9, self.warmup_iters
        )
        self.tx = optax.adamw(
            self.schedule, weight_decay=self.weight_decay
        )
        self._train_jit = jax.jit(self._train_step)
        self._pred_jit = jax.jit(self._predict)

    def _features(self, fp, images):
        if self.feature_params is None:
            return self.feature_fn(images)
        return self.feature_fn(fp, images)

    def init_state(self, example_images: Array):
        feats = self._features(self.feature_params, example_images[:1])
        variables = self.head.init(
            jax.random.PRNGKey(self.seed), feats, train=False
        )
        params = variables["params"]
        return {
            "params": params,
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": self.tx.init(params),
            "step": jnp.zeros((), jnp.int32),
        }

    def _loss(self, params, batch_stats, images, gt, fp):
        feats = jax.lax.stop_gradient(self._features(fp, images))
        pred, updates = self.head.apply(
            {"params": params, "batch_stats": batch_stats},
            feats,
            train=True,
            mutable=["batch_stats"],
        )
        pred = bilinear_upsample(pred[..., None], gt.shape[1:3])[..., 0]
        loss = self.sig_weight * sig_loss(pred, gt, self.max_depth)
        gl = 0.0
        for b in range(gt.shape[0]):
            gl = gl + gradient_loss(pred[b], gt[b], self.max_depth)
        loss = loss + self.grad_weight * gl / gt.shape[0]
        return loss, updates["batch_stats"]

    def _train_step(self, state, images, gt, fp):
        (loss, new_stats), grads = jax.value_and_grad(
            self._loss, has_aux=True
        )(state["params"], state["batch_stats"], images, gt, fp)
        updates, opt_state = self.tx.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        return (
            {
                "params": params,
                "batch_stats": new_stats,
                "opt_state": opt_state,
                "step": state["step"] + 1,
            },
            {"loss": loss, "lr": self.schedule(state["step"])},
        )

    def train_step(self, state, images, gt):
        return self._train_jit(state, images, gt, self.feature_params)

    def _predict(self, state, images, fp):
        feats = self._features(fp, images)
        pred = self.head.apply(
            {"params": state["params"], "batch_stats": state["batch_stats"]},
            feats,
            train=False,
        )
        return bilinear_upsample(pred[..., None], images.shape[1:3])[..., 0]

    def predict(self, state, images: Array) -> Array:
        return self._pred_jit(state, images, self.feature_params)
