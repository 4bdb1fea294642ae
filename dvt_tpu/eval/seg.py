"""Semantic-segmentation linear probe: BNHead + slide inference + mIoU.

Self-contained TPU rebuild of the reference's mmseg fork (evaluation/
segmentation/): the probe is a (Sync)BatchNorm over the frozen backbone's
last-layer feature map followed by a 1x1 classifier
(models/decode_heads/linear_head.py:14-96), trained with cross-entropy
(ignore 255) under the recipe of evaluation/configs/vitb_voc2012_linear_
config.py (AdamW lr 1e-3 wd 1e-4, poly power 1.0 with 1500-iter linear
warmup, 40k iters), evaluated with 512x512 slide inference at stride 341
(EncoderDecoder.slide_inference semantics: accumulate logits, divide by
counts) and mIoU/aAcc/mAcc aggregation.

SyncBN: flax BatchNorm with axis_name="data" - the cross-replica mean ride
ICI as a psum, replacing torch SyncBatchNorm.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from dvt_tpu.eval.glue import data_sharded_call

Array = jax.Array


def resize_concat(inputs, in_index: Sequence[int],
                  align_corners: bool = False) -> Array:
    """The reference BNHead's 'resize_concat' input transform
    (evaluation/segmentation/models/decode_heads/linear_head.py:48-85):
    select ``in_index`` maps from a multi-level list, bilinear-resize each
    to the FIRST selected map's spatial shape, concat on channels. (B, C)
    descriptors broadcast as 1x1 maps."""
    maps = []
    for i in in_index:
        x = inputs[i]
        if x.ndim == 2:  # image-level descriptor -> 1x1 map
            x = x[:, None, None, :]
        maps.append(x)
    target = maps[0].shape[1:3]
    maps = [
        m if m.shape[1:3] == target
        else bilinear_upsample(m, target, align_corners=align_corners)
        for m in maps
    ]
    return jnp.concatenate(maps, axis=-1)


class BNHead(nn.Module):
    """BatchNorm + 1x1 conv classifier on (B, h, w, C) features.

    ``feats`` may be a single map or a LIST of multi-level maps; lists go
    through the reference's resize_concat transform with ``in_index``
    selecting levels (linear_head.py:41-85; the shipped VOC/ADE recipes
    tap out_indices [8,9,10,11] with in_index [3] = last layer only)."""

    num_classes: int
    in_index: Sequence[int] = (0,)
    align_corners: bool = False
    sync_axis: Optional[str] = None  # "data" under shard_map/pjit with axis
    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, feats, train: bool = False) -> Array:
        if isinstance(feats, (list, tuple)):
            feats = resize_concat(feats, self.in_index, self.align_corners)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            axis_name=self.sync_axis if train else None,
            name="bn",
        )(feats)
        x = nn.Dense(self.num_classes, name="conv_seg")(x)
        return x  # (B, h, w, num_classes) logits at feature resolution


def poly_schedule(base_lr: float, total_iters: int, power: float = 1.0,
                  warmup_iters: int = 1500, warmup_ratio: float = 1e-6,
                  min_lr: float = 0.0):
    """mmcv poly LR with linear warmup (the eval configs' lr_config)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        t = jnp.clip(step / total_iters, 0.0, 1.0)
        poly = (base_lr - min_lr) * (1 - t) ** power + min_lr
        # mmcv warmup multiplies the factor into the CURRENT annealed lr
        # (LrUpdaterHook.get_warmup_lr scales regular_lr, not base_lr),
        # so the curve is continuous at warmup end
        k = 1.0 - (1.0 - step / max(warmup_iters, 1)) * (1.0 - warmup_ratio)
        return jnp.where(step < warmup_iters, k * poly, poly)

    return fn


def cross_entropy_ignore(logits: Array, labels: Array,
                         ignore_index: int = 255) -> Array:
    """Mean CE over valid pixels; labels (B, H, W) int, logits (B, H, W, K)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return -jnp.sum(ll * valid) / jnp.maximum(jnp.sum(valid), 1)


def bilinear_upsample(x: Array, size: Tuple[int, int],
                      align_corners: bool = False) -> Array:
    """(B, h, w, C) -> (B, H, W, C); mmseg resize(align_corners=False)."""
    b, h, w, c = x.shape
    if align_corners and (size[0] > 1 and size[1] > 1):
        ys = jnp.linspace(0, h - 1, size[0])
        xs = jnp.linspace(0, w - 1, size[1])
    else:
        ys = (jnp.arange(size[0]) + 0.5) * h / size[0] - 0.5
        xs = (jnp.arange(size[1]) + 0.5) * w / size[1] - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    ty = jnp.clip(ys - y0, 0, 1)[None, :, None, None]
    tx = jnp.clip(xs - x0, 0, 1)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - tx) + x[:, y0][:, :, x1] * tx
    bot = x[:, y1][:, :, x0] * (1 - tx) + x[:, y1][:, :, x1] * tx
    return top * (1 - ty) + bot * ty


@dataclasses.dataclass
class SegLinearProbe:
    """Frozen-backbone linear probe trainer/evaluator.

    feature_fn(images (B, H, W, 3)) -> (B, h, w, C) is the frozen feature
    extractor (raw ViT, ViT+denoiser, or distilled ViT - the three eval
    modes of evaluate_dense_tasks.py:183-214).
    """

    feature_fn: Callable  # (images) -> feats, or (feature_params, images)
    num_classes: int
    feature_params: Any = None  # threaded as a jit argument when given
    mesh: Any = None
    lr: float = 1e-3
    weight_decay: float = 1e-4
    total_iters: int = 40_000
    warmup_iters: int = 1500
    grad_accum_steps: int = 1  # DistOptimizerHook update_interval semantics
    seed: int = 0

    def __post_init__(self):
        self.head = BNHead(num_classes=self.num_classes)
        self.schedule = poly_schedule(
            self.lr, self.total_iters, 1.0, self.warmup_iters
        )
        from dvt_tpu.train.optim import dilate_schedule

        self.tx = optax.adamw(
            dilate_schedule(self.schedule, self.grad_accum_steps),
            b1=0.9, b2=0.999, weight_decay=self.weight_decay,
        )
        if self.grad_accum_steps > 1:
            # grads averaged over N mini-steps, optimizer applied every Nth
            # (evaluation/segmentation/hooks/optimizer.py:15-47); schedule
            # dilated so LR-vs-mini-iteration matches the per-iter LR hook
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=self.grad_accum_steps
            )
        self._train_jit = None
        self._logits_jit = jax.jit(self._logits)

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
        batch_stats = variables.get("batch_stats", {})
        state = {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": self.tx.init(params),
            "step": jnp.zeros((), jnp.int32),
        }
        if self.mesh is not None:
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        return state

    def _loss(self, params, batch_stats, images, labels, fp):
        feats = jax.lax.stop_gradient(self._features(fp, images))
        logits, updates = self.head.apply(
            {"params": params, "batch_stats": batch_stats},
            feats,
            train=True,
            mutable=["batch_stats"],
        )
        logits = bilinear_upsample(logits, labels.shape[1:3])
        loss = cross_entropy_ignore(logits, labels)
        return loss, updates["batch_stats"]

    def _train_step(self, state, images, labels, fp):
        (loss, new_stats), grads = jax.value_and_grad(
            self._loss, has_aux=True
        )(state["params"], state["batch_stats"], images, labels, fp)
        updates, opt_state = self.tx.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "batch_stats": new_stats,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        return new_state, {"loss": loss, "lr": self.schedule(state["step"])}

    def train_step(self, state, images, labels):
        if self._train_jit is None:
            kwargs = {}
            if self.mesh is not None:
                repl = NamedSharding(self.mesh, P())
                data = NamedSharding(self.mesh, P("data"))
                kwargs = dict(
                    in_shardings=(
                        jax.tree.map(lambda _: repl, state,
                                     is_leaf=lambda x: isinstance(x, jax.Array)),
                        data, data,
                        jax.tree.map(lambda _: repl, self.feature_params,
                                     is_leaf=lambda x: isinstance(x, jax.Array)),
                    ),
                )
            self._train_jit = jax.jit(self._train_step, **kwargs)
        return self._train_jit(state, images, labels, self.feature_params)

    def _logits(self, state, images, fp):
        feats = self._features(fp, images)
        logits = self.head.apply(
            {"params": state["params"], "batch_stats": state["batch_stats"]},
            feats,
            train=False,
        )
        return bilinear_upsample(logits, images.shape[1:3])

    def predict_logits(self, state, images: Array) -> Array:
        """Batched window/image inference; with a mesh the batch axis is
        sharded over 'data' via glue.data_sharded_call (same pattern as
        DepthProbe.predict)."""
        return data_sharded_call(
            self.mesh,
            lambda im: self._logits_jit(state, im, self.feature_params),
            images)


def slide_inference(
    logits_fn: Callable[[Array], Array],
    image: np.ndarray,
    num_classes: int,
    crop: Tuple[int, int] = (512, 512),
    stride: Tuple[int, int] = (341, 341),
) -> np.ndarray:
    """mmseg EncoderDecoder.slide_inference (encoder_decoder.py:153-204):
    window the image, sum window logits into a canvas, divide by counts.

    image: (H, W, 3) normalized. Returns (H, W, num_classes) fp32 logits.
    """
    h, w = image.shape[:2]
    ch, cw = min(crop[0], h), min(crop[1], w)
    sh, sw = stride
    grids_h = max(int(np.ceil((h - ch) / sh)) + 1, 1)
    grids_w = max(int(np.ceil((w - cw) / sw)) + 1, 1)
    canvas = np.zeros((h, w, num_classes), np.float32)
    count = np.zeros((h, w, 1), np.float32)
    for gy in range(grids_h):
        for gx in range(grids_w):
            y1 = min(gy * sh, h - ch)
            x1 = min(gx * sw, w - cw)
            patch = image[y1 : y1 + ch, x1 : x1 + cw]
            logits = np.asarray(logits_fn(jnp.asarray(patch[None])))[0]
            canvas[y1 : y1 + ch, x1 : x1 + cw] += logits
            count[y1 : y1 + ch, x1 : x1 + cw] += 1
    return canvas / np.maximum(count, 1)


def slide_inference_batched(
    logits_fn: Callable[[Array], Array],
    images: Sequence[np.ndarray],
    num_classes: int,
    crop: Tuple[int, int] = (512, 512),
    stride: Tuple[int, int] = (341, 341),
    window_batch: int = 8,
) -> Sequence[np.ndarray]:
    """Batched slide inference over MANY images per dispatch round.

    ``slide_inference`` dispatches one 512^2 window at a time — on a full
    VOC val sweep (1449 images x ~4 windows) that is thousands of
    dispatch rounds and leaves a device mesh idle. This variant collects
    every (image, window) task across the image list, groups tasks by
    window shape (images smaller than the crop produce smaller windows),
    stacks ``window_batch`` windows per ``logits_fn`` call (padding the
    tail by repetition), and scatters window logits back into per-image
    canvases. Numerically identical to per-window slide_inference: eval
    BatchNorm uses running stats, so rows of the batch never interact.

    logits_fn: (B, ch, cw, 3) -> (B, ch, cw, K), e.g. a mesh-sharded
    SegLinearProbe.predict_logits. Returns one (H, W, K) fp32 canvas per
    image, in input order.
    """
    sh, sw = stride
    canvases = [
        np.zeros((im.shape[0], im.shape[1], num_classes), np.float32)
        for im in images
    ]
    counts = [np.zeros((im.shape[0], im.shape[1], 1), np.float32)
              for im in images]
    tasks: Dict[Tuple[int, int], list] = {}
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        ch, cw = min(crop[0], h), min(crop[1], w)
        grids_h = max(int(np.ceil((h - ch) / sh)) + 1, 1)
        grids_w = max(int(np.ceil((w - cw) / sw)) + 1, 1)
        for gy in range(grids_h):
            for gx in range(grids_w):
                y1 = min(gy * sh, h - ch)
                x1 = min(gx * sw, w - cw)
                tasks.setdefault((ch, cw), []).append((i, y1, x1))
    for (ch, cw), group in tasks.items():
        for s in range(0, len(group), window_batch):
            chunk = group[s : s + window_batch]
            batch = np.stack([
                images[i][y1 : y1 + ch, x1 : x1 + cw]
                for i, y1, x1 in chunk
            ])
            if len(chunk) < window_batch:  # static shape for one compile
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:],
                                      window_batch - len(chunk), 0)])
            logits = np.asarray(logits_fn(jnp.asarray(batch)))
            for (i, y1, x1), lg in zip(chunk, logits):
                canvases[i][y1 : y1 + ch, x1 : x1 + cw] += lg
                counts[i][y1 : y1 + ch, x1 : x1 + cw] += 1
    return [c / np.maximum(n, 1) for c, n in zip(canvases, counts)]


class ConfusionAccumulator:
    """Streaming intersection/union/label counts -> mIoU/aAcc/mAcc
    (mmseg pre_eval + IoU aggregation semantics)."""

    def __init__(self, num_classes: int, ignore_index: int = 255):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.intersect = np.zeros(num_classes, np.float64)
        self.union = np.zeros(num_classes, np.float64)
        self.pred_count = np.zeros(num_classes, np.float64)
        self.label_count = np.zeros(num_classes, np.float64)

    def add(self, pred: np.ndarray, label: np.ndarray):
        mask = label != self.ignore_index
        pred = pred[mask]
        label = label[mask]
        inter = pred[pred == label]
        self.intersect += np.bincount(inter, minlength=self.num_classes)
        self.pred_count += np.bincount(pred, minlength=self.num_classes)
        self.label_count += np.bincount(label, minlength=self.num_classes)
        self.union = self.pred_count + self.label_count - self.intersect

    def results(self) -> Dict[str, float]:
        iou = self.intersect / np.maximum(self.union, 1)
        acc = self.intersect / np.maximum(self.label_count, 1)
        # mmseg nanmean semantics: a class counts toward mIoU whenever its
        # union > 0 — including classes predicted but absent from GT
        # (IoU 0); only never-seen-anywhere classes are excluded. mAcc
        # averages over classes present in GT.
        present = self.union > 0
        present_gt = self.label_count > 0
        return {
            "mIoU": float(np.mean(iou[present]) * 100),
            "mAcc": float(np.mean(acc[present_gt]) * 100),
            "aAcc": float(
                self.intersect.sum() / max(self.label_count.sum(), 1) * 100
            ),
        }


def mean_iou(preds: Sequence[np.ndarray], labels: Sequence[np.ndarray],
             num_classes: int, ignore_index: int = 255) -> Dict[str, float]:
    acc = ConfusionAccumulator(num_classes, ignore_index)
    for p, l in zip(preds, labels):
        acc.add(p, l)
    return acc.results()
