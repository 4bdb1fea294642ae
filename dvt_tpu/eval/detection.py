"""Detection probe: anchors, NMS, RoIAlign, RPN + Faster-RCNN heads.

Completes the ViTDet evaluation path (SURVEY.md 2.7). The reference ships
only the backbone adapters (evaluation/vitdet/) plus a config
(evaluation/configs/vitb_voc2012_vitdet_config.py) whose mmdet base file
``faster_rcnn_r50_fpn.py`` is absent, so its detection eval is not runnable
as shipped. This module provides a runnable TPU-native equivalent of that
config's model: frozen ViT backbone (global attention by default;
per-block windowed attention via evaluate_dense_tasks --det_window_size,
models/vit.py window_size) -> SimpleFPN (num_outs=5: p6 maxpool level for
the RPN; optional fixed sin-cos pos embed via add_pe, the _pe config
variant) -> 2-conv RPN -> RoIAlign ->
Shared4Conv1FC box head with LN2d (the config's overrides,
vitb_voc2012_vitdet_config.py:62-81), AdamW + mmcv step LR
([20000, 22000] gamma 0.1, warmup 100), standard Faster-RCNN losses and a
VOC-style AP@0.5 evaluator.

TPU-first shapes: every stage is fixed-size (padded proposals, masked
boxes), NMS is an iterative argmax/mask loop under ``lax.fori_loop``, and
RoIAlign is a vmapped bilinear gather - no dynamic shapes anywhere, so the
whole train step is one XLA program.

Box convention: (x1, y1, x2, y2) in input-image pixels. Delta encoding is
mmdet's DeltaXYWHBBoxCoder: unit stds for the RPN, [.1,.1,.2,.2] for the
RCNN stage. Test NMS is full mmdet multiclass_nms: every (proposal,
class) pair above score_thr is a candidate, bounded by a shape-static
top-1000 pre-filter, suppressed per class via the batched_nms
class-offset trick.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jax.Array


# ---------- boxes ----------

def box_area(b: Array) -> Array:
    return jnp.maximum(b[..., 2] - b[..., 0], 0) * jnp.maximum(
        b[..., 3] - b[..., 1], 0
    )


def box_iou(a: Array, b: Array) -> Array:
    """(N, 4) x (M, 4) -> (N, M) IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


# mmdet DeltaXYWHBBoxCoder target stds: the RCNN stage uses
# [0.1, 0.1, 0.2, 0.2] (faster_rcnn base model), the RPN unit stds.
RCNN_DELTA_STDS = (0.1, 0.1, 0.2, 0.2)


def encode_deltas(anchors: Array, gt: Array, stds=None) -> Array:
    """Anchor -> gt regression targets (dx, dy, dw, dh) / stds."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1e-6)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1e-6)
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    out = jnp.stack([
        (gx - ax) / jnp.maximum(aw, 1e-6),
        (gy - ay) / jnp.maximum(ah, 1e-6),
        jnp.log(gw / jnp.maximum(aw, 1e-6)),
        jnp.log(gh / jnp.maximum(ah, 1e-6)),
    ], axis=-1)
    if stds is not None:
        out = out / jnp.asarray(stds, out.dtype)
    return out


def decode_deltas(anchors: Array, deltas: Array,
                  max_wh: float = 4.135, stds=None) -> Array:
    """Apply (dx, dy, dw, dh) * stds to anchors; log deltas clamped."""
    if stds is not None:
        deltas = deltas * jnp.asarray(stds, deltas.dtype)
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    dx, dy, dw, dh = [deltas[..., i] for i in range(4)]
    dw = jnp.clip(dw, -max_wh, max_wh)
    dh = jnp.clip(dh, -max_wh, max_wh)
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    return jnp.stack(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1
    )


def generate_anchors(feat_shape: Tuple[int, int], stride: int,
                     scales: Sequence[float] = (8,),
                     ratios: Sequence[float] = (0.5, 1.0, 2.0)) -> np.ndarray:
    """(h*w*A, 4) anchors for one pyramid level, centered on cells."""
    h, w = feat_shape
    base = []
    for s in scales:
        size = s * stride
        for r in ratios:
            bw = size * np.sqrt(1.0 / r)
            bh = size * np.sqrt(r)
            base.append([-bw / 2, -bh / 2, bw / 2, bh / 2])
    base = np.asarray(base, np.float32)  # (A, 4)
    ys = (np.arange(h, dtype=np.float32) + 0.5) * stride
    xs = (np.arange(w, dtype=np.float32) + 0.5) * stride
    cx, cy = np.meshgrid(xs, ys)
    centers = np.stack([cx, cy, cx, cy], -1).reshape(-1, 1, 4)
    return (centers + base[None]).reshape(-1, 4)


def nms(boxes: Array, scores: Array, iou_thr: float = 0.7,
        max_out: int = 100, score_thr: float = -jnp.inf) -> Tuple[Array, Array]:
    """Fixed-size NMS: returns (indices (max_out,), valid mask (max_out,)).

    Iterative argmax + IoU suppression under ``lax.fori_loop`` (O(max_out
    * N) - shape-static, jit/vmap friendly; detection eval sizes are small).
    """
    n = boxes.shape[0]
    ious = box_iou(boxes, boxes)
    live = scores > score_thr

    def body(i, carry):
        live, out_idx, out_ok = carry
        masked = jnp.where(live, scores, -jnp.inf)
        j = jnp.argmax(masked)
        ok = masked[j] > -jnp.inf
        out_idx = out_idx.at[i].set(jnp.where(ok, j, 0))
        out_ok = out_ok.at[i].set(ok)
        suppress = ious[j] > iou_thr
        live = live & ~suppress & ok
        return live, out_idx, out_ok

    _, idx, ok = jax.lax.fori_loop(
        0, max_out, body,
        (live, jnp.zeros((max_out,), jnp.int32), jnp.zeros((max_out,), bool)),
    )
    return idx, ok


def roi_align(feat: Array, boxes: Array, output_size: int = 7,
              stride: int = 16, sampling: int = 2) -> Array:
    """RoIAlign on one (H, W, C) map: (R, 4) boxes -> (R, out, out, C).

    Bilinear sampling at ``sampling^2`` points per output cell, averaged -
    torchvision/mmcv RoIAlign semantics (aligned=True: -0.5 offset)."""
    h, w, c = feat.shape

    def one(box):
        x1, y1, x2, y2 = box / stride
        bw = jnp.maximum(x2 - x1, 1e-6)
        bh = jnp.maximum(y2 - y1, 1e-6)
        cell_w = bw / output_size
        cell_h = bh / output_size
        # sample grid: per output cell, sampling x sampling points
        ii = jnp.arange(output_size * sampling) + 0.5
        ys = y1 + ii * (cell_h / sampling) - 0.5
        xs = x1 + ii * (cell_w / sampling) - 0.5
        y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
        x0 = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
        y1i = jnp.clip(y0 + 1, 0, h - 1)
        x1i = jnp.clip(x0 + 1, 0, w - 1)
        ty = jnp.clip(ys - y0, 0, 1)[:, None, None]
        tx = jnp.clip(xs - x0, 0, 1)[None, :, None]
        top = feat[y0][:, x0] * (1 - tx) + feat[y0][:, x1i] * tx
        bot = feat[y1i][:, x0] * (1 - tx) + feat[y1i][:, x1i] * tx
        grid = top * (1 - ty) + bot * ty  # (S, S, C), S = out*sampling
        s = output_size
        grid = grid.reshape(s, sampling, s, sampling, c)
        return grid.mean(axis=(1, 3))

    return jax.vmap(one)(boxes)


# ---------- heads ----------

class RPNHead(nn.Module):
    """Stacked 3x3 convs + 1x1 objectness/delta heads, shared across
    levels (the VOC config overrides rpn_head=dict(num_convs=2),
    vitb_voc2012_vitdet_config.py:74)."""

    num_anchors: int = 3
    num_convs: int = 2

    @nn.compact
    def __call__(self, feats: Sequence[Array]):
        convs = [nn.Conv(256, (3, 3), padding="SAME", name=f"rpn_conv_{i}")
                 for i in range(self.num_convs)]
        cls = nn.Conv(self.num_anchors, (1, 1), name="rpn_cls")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), name="rpn_reg")
        logits, deltas = [], []
        for f in feats:
            x = f
            for conv in convs:
                x = nn.relu(conv(x))
            b, h, w, _ = x.shape
            logits.append(cls(x).reshape(b, h * w * self.num_anchors))
            deltas.append(reg(x).reshape(b, h * w * self.num_anchors, 4))
        return jnp.concatenate(logits, 1), jnp.concatenate(deltas, 1)


class BoxHead(nn.Module):
    """RoI box head -> (num_classes + 1) logits + class-agnostic deltas.

    Default variant 'shared4conv1fc' matches the VOC config's
    Shared4Conv1FCBBoxHead override (4x [conv3x3(256) + LN2d + relu] then
    one 1024-FC, norm_cfg=LN2d - vitb_voc2012_vitdet_config.py:62,75-81);
    'shared2fc' keeps the mmdet base-model 2-FC head."""

    num_classes: int
    hidden: int = 1024
    conv_channels: int = 256
    variant: str = "shared4conv1fc"

    @nn.compact
    def __call__(self, rois: Array):
        from dvt_tpu.eval.vitdet import LN2d

        x = rois
        if self.variant == "shared4conv1fc":
            for i in range(4):
                x = nn.Conv(self.conv_channels, (3, 3), padding="SAME",
                            use_bias=False, name=f"conv{i}")(x)
                x = LN2d(name=f"conv{i}_ln")(x)
                x = nn.relu(x)
            x = x.reshape(x.shape[0], -1)
            x = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        else:  # shared2fc
            x = x.reshape(x.shape[0], -1)
            x = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
            x = nn.relu(nn.Dense(self.hidden, name="fc2")(x))
        logits = nn.Dense(self.num_classes + 1, name="cls")(x)
        deltas = nn.Dense(4, name="reg")(x)
        return logits, deltas


# ---------- assignment / losses ----------

def assign_anchors(anchors: Array, gt_boxes: Array, gt_valid: Array,
                   pos_thr: float = 0.7, neg_thr: float = 0.3):
    """Max-IoU assigner: returns (labels (N,) in {-1 ignore, 0 neg, 1 pos},
    matched gt index (N,)). Forces each valid gt's best anchor positive."""
    iou = box_iou(anchors, gt_boxes)  # (N, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    labels = jnp.where(best_iou >= pos_thr, 1,
                       jnp.where(best_iou < neg_thr, 0, -1))
    # each gt's best anchor is positive (mmdet's match_low_quality).
    # Invalid gt slots route to an out-of-range index and are DROPPED:
    # scattering their False at a shared index with a real gt's True
    # would race (duplicate-index .set order is implementation-defined)
    gt_best_anchor = jnp.argmax(iou, axis=0)  # (G,)
    n = anchors.shape[0]
    idx = jnp.where(gt_valid, gt_best_anchor, n)
    forced = jnp.zeros(n, bool).at[idx].set(True, mode="drop")
    labels = jnp.where(forced, 1, labels)
    return labels, best_gt


def map_roi_levels(boxes: Array, num_levels: int = 4,
                   finest_scale: float = 56.0) -> Array:
    """FPN level per box, mmdet SingleRoIExtractor.map_roi_levels:
    lvl = floor(log2(sqrt(area) / finest_scale)), clamped to
    [0, num_levels-1] - a 56 px box pools from the finest level, each
    scale doubling moves one level coarser."""
    scale = jnp.sqrt(jnp.maximum(box_area(boxes), 1e-6))
    return jnp.clip(
        jnp.floor(jnp.log2(scale / finest_scale + 1e-6)), 0, num_levels - 1
    ).astype(jnp.int32)


def smooth_l1(x: Array, beta: float = 1.0) -> Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def step_schedule(base_lr: float, steps=(20_000, 22_000), gamma: float = 0.1,
                  warmup_iters: int = 100, warmup_ratio: float = 1e-3):
    """mmcv step LR policy with linear warmup (the VOC detection config's
    lr_config: policy='step', step=[20000, 22000], gamma=0.1, warmup 100
    iters at ratio 1e-3 - vitb_voc2012_vitdet_config.py:100-108). The
    warmup factor multiplies the CURRENT stepped lr (mmcv get_warmup_lr
    scales regular_lr)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        n_past = sum((step >= s).astype(jnp.float32) for s in steps)
        regular = base_lr * gamma ** n_past
        k = 1.0 - (1.0 - step / max(warmup_iters, 1)) * (1.0 - warmup_ratio)
        return jnp.where(step < warmup_iters, k * regular, regular)

    return fn


def subsample_mask(key, labels: Array, num: int, pos_fraction: float = 0.5):
    """Random balanced sampling of pos/neg anchors: returns weight mask."""
    pos = labels == 1
    neg = labels == 0
    rnd = jax.random.uniform(key, labels.shape)
    max_pos = int(num * pos_fraction)

    def topk_mask(mask, k):
        score = jnp.where(mask, rnd, -1.0)
        thresh = -jnp.sort(-score)[jnp.minimum(k, score.shape[0]) - 1]
        return mask & (score >= thresh) & (score > -1.0)

    n_pos = jnp.sum(pos)
    pos_keep = topk_mask(pos, max_pos)
    n_pos_kept = jnp.minimum(n_pos, max_pos)
    # dynamic k for negatives: num - kept positives
    score = jnp.where(neg, rnd, -1.0)
    order = jnp.argsort(-score)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    neg_keep = neg & (rank < (num - n_pos_kept))
    return pos_keep, neg_keep


# ---------- the probe ----------

@dataclasses.dataclass
class FasterRCNNProbe:
    """Frozen-backbone Faster-RCNN trainer/evaluator on SimpleFPN levels.

    feature_fn(images) (or (params, images)) -> single (B, h, w, C) map;
    the probe owns SimpleFPN + RPN + box head (the trainable parts -- the
    reference freezes the ViT and trains the detector on top,
    evaluation/configs/vitb_voc2012_vitdet_config.py).
    """

    feature_fn: Callable
    num_classes: int = 20
    feature_params: Any = None
    input_stride: int = 16  # backbone map stride w.r.t. input pixels
    image_size: int = 512
    lr: float = 1e-4
    weight_decay: float = 0.1
    total_iters: int = 24_000  # runner max_iters (the step LR's decay
    # points are absolute mmcv steps [20000, 22000], not fractions)
    rpn_sample: int = 256
    roi_sample: int = 128
    num_proposals: int = 300
    warmup_iters: int = 100  # config lr_config warmup_iters
    # _pe config variant: fixed 2-D sin-cos pos embed added to the
    # backbone map inside SimpleFPN (vitb_voc2012_vitdet_pe_config.py:72)
    add_pe: bool = False
    seed: int = 0

    def __post_init__(self):
        from dvt_tpu.eval.vitdet import SimpleFPN

        self.fpn = SimpleFPN(out_channels=256, add_pe=self.add_pe)
        self.rpn = RPNHead()
        self.box_head = BoxHead(self.num_classes)
        # RPN sees 5 levels (config neck num_outs=5: p6 = stride-2
        # 1x1 maxpool of p5, mmdet FPN add_extra_convs default); the
        # RoI extractor keeps the first 4 (SingleRoIExtractor
        # featmap_strides)
        self.strides = [self.input_stride // 4, self.input_stride // 2,
                        self.input_stride, self.input_stride * 2,
                        self.input_stride * 4]
        self.schedule = step_schedule(self.lr,
                                      warmup_iters=self.warmup_iters)
        self.tx = optax.adamw(self.schedule, weight_decay=self.weight_decay)
        self._train_jit = jax.jit(self._train_step)
        self._infer_jit = jax.jit(self._infer)

    # anchors for all levels at a fixed input size (static)
    def _anchors(self, feat_hw: Tuple[int, int]):
        anchors = []
        h, w = feat_hw
        h5, w5 = h // 2, w // 2  # p5 = 2x2 VALID maxpool -> floor
        sizes = [(h * 4, w * 4), (h * 2, w * 2), (h, w), (h5, w5),
                 ((h5 + 1) // 2, (w5 + 1) // 2)]  # p6 = 1x1 s2 pool
        for (lh, lw), s in zip(sizes, self.strides):
            anchors.append(generate_anchors((lh, lw), s))
        return jnp.asarray(np.concatenate(anchors), jnp.float32)

    def _features(self, fp, images):
        out = (self.feature_fn(images) if self.feature_params is None
               else self.feature_fn(fp, images))
        return jax.lax.stop_gradient(out)

    def init_state(self, example_images: Array):
        feats = self._features(self.feature_params, example_images[:1])
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(self.seed), 3)
        fpn_p = self.fpn.init(k1, feats)["params"]
        levels = self.fpn.apply({"params": fpn_p}, feats)
        p6 = nn.max_pool(levels[-1], (1, 1), strides=(2, 2))
        rpn_p = self.rpn.init(k2, list(levels) + [p6])["params"]
        rois = jnp.zeros((1, 7, 7, 256))
        box_p = self.box_head.init(k3, rois)["params"]
        params = {"fpn": fpn_p, "rpn": rpn_p, "box": box_p}
        return {
            "params": params,
            "opt_state": self.tx.init(params),
            "step": jnp.zeros((), jnp.int32),
        }

    def _forward_rpn(self, params, feats):
        levels = self.fpn.apply({"params": params["fpn"]}, feats)
        # p6 for the RPN only (config num_outs=5): 1x1 stride-2 maxpool
        # of p5, mmdet FPN extra level
        p6 = nn.max_pool(levels[-1], (1, 1), strides=(2, 2))
        logits, deltas = self.rpn.apply({"params": params["rpn"]},
                                        list(levels) + [p6])
        return levels, logits, deltas

    def _proposals(self, anchors, logits, deltas):
        """Per-image proposal boxes (num_proposals, 4) + validity."""
        boxes = decode_deltas(anchors, deltas)
        boxes = jnp.clip(boxes, 0, self.image_size)
        # pre-NMS top-k by objectness for tractable NMS size
        k = min(1000, logits.shape[0])
        top = jax.lax.top_k(logits, k)[1]
        idx, ok = nms(boxes[top], logits[top], 0.7, self.num_proposals)
        props = boxes[top][idx]
        return props, ok

    def _loss(self, params, key, images_feats, gt_boxes, gt_labels, gt_valid,
              anchors):
        levels, logits, deltas = self._forward_rpn(params, images_feats)
        b = logits.shape[0]
        total_rpn_cls = total_rpn_reg = total_roi_cls = total_roi_reg = 0.0
        for i in range(b):
            ki = jax.random.fold_in(key, i)
            labels, match = assign_anchors(anchors, gt_boxes[i], gt_valid[i])
            pos_m, neg_m = subsample_mask(
                jax.random.fold_in(ki, 0), labels, self.rpn_sample
            )
            cls_m = pos_m | neg_m
            tgt = (labels == 1).astype(jnp.float32)
            bce = optax.sigmoid_binary_cross_entropy(logits[i], tgt)
            total_rpn_cls += jnp.sum(bce * cls_m) / jnp.maximum(
                jnp.sum(cls_m), 1)
            reg_t = encode_deltas(anchors, gt_boxes[i][match])
            reg_l = smooth_l1(deltas[i] - reg_t, beta=1.0 / 9).sum(-1)
            total_rpn_reg += jnp.sum(reg_l * pos_m) / jnp.maximum(
                jnp.sum(pos_m), 1)

            # --- ROI stage on sampled proposals (teacher-forced with gt
            # boxes appended, the standard trick for stable early training)
            props, ok = self._proposals(
                anchors,
                jax.lax.stop_gradient(logits[i]),
                jax.lax.stop_gradient(deltas[i]),
            )
            props = jnp.concatenate([props, gt_boxes[i]], 0)
            ok = jnp.concatenate([ok, gt_valid[i]], 0)
            plabels, pmatch = assign_anchors(
                props, gt_boxes[i], gt_valid[i], pos_thr=0.5, neg_thr=0.5
            )
            plabels = jnp.where(ok, plabels, -1)
            pos_p, neg_p = subsample_mask(
                jax.random.fold_in(ki, 2), plabels, self.roi_sample,
                pos_fraction=0.25,
            )
            sample_m = pos_p | neg_p
            # class target: matched gt class + 1 for pos, 0 = background
            cls_t = jnp.where(pos_p, gt_labels[i][pmatch] + 1, 0)
            rois = self._extract_rois(levels, props, batch_index=i)
            roi_logits, roi_deltas = self.box_head.apply(
                {"params": params["box"]}, rois
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                roi_logits, cls_t)
            total_roi_cls += jnp.sum(ce * sample_m) / jnp.maximum(
                jnp.sum(sample_m), 1)
            roi_t = encode_deltas(props, gt_boxes[i][pmatch],
                                  stds=RCNN_DELTA_STDS)
            roi_l = smooth_l1(roi_deltas - roi_t).sum(-1)
            total_roi_reg += jnp.sum(roi_l * pos_p) / jnp.maximum(
                jnp.sum(pos_p), 1)
        loss = (total_rpn_cls + total_rpn_reg + total_roi_cls +
                total_roi_reg) / b
        return loss, {
            "rpn_cls": total_rpn_cls / b, "rpn_reg": total_rpn_reg / b,
            "roi_cls": total_roi_cls / b, "roi_reg": total_roi_reg / b,
        }

    def _extract_rois(self, levels, boxes, batch_index):
        lvl = map_roi_levels(boxes)
        outs = []
        for li, (level, s) in enumerate(zip(levels, self.strides)):
            outs.append(roi_align(level[batch_index], boxes, 7, s))
        stacked = jnp.stack(outs)  # (4, R, 7, 7, C)
        return jnp.take_along_axis(
            stacked, lvl[None, :, None, None, None], axis=0
        )[0]

    def _train_step(self, state, key, images, gt_boxes, gt_labels, gt_valid,
                    fp):
        feats = self._features(fp, images)
        anchors = self._anchors(feats.shape[1:3])

        def loss_fn(params):
            return self._loss(params, key, feats, gt_boxes, gt_labels,
                              gt_valid, anchors)


        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt_state = self.tx.update(
            grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        metrics["loss"] = loss
        metrics["lr"] = self.schedule(state["step"])
        return ({"params": params, "opt_state": opt_state,
                 "step": state["step"] + 1}, metrics)

    def train_step(self, state, key, images, gt_boxes, gt_labels, gt_valid):
        return self._train_jit(state, key, images, gt_boxes, gt_labels,
                               gt_valid, self.feature_params)

    def _infer(self, state, images, fp):
        """Returns per-image (boxes (D, 4), scores (D,), classes (D,),
        valid (D,)) with D = num_proposals detections after mmdet
        multiclass_nms: EVERY (proposal, class) pair above score_thr is a
        candidate (not just the argmax class), a shape-static top
        ``nms_pre`` by score bounds the IoU matrix, and the batched_nms
        class-offset trick makes one NMS call suppress within classes
        only."""
        params = state["params"]
        feats = self._features(fp, images)
        anchors = self._anchors(feats.shape[1:3])
        levels, logits, deltas = self._forward_rpn(params, feats)
        ncls = self.num_classes
        nms_pre = min(1000, self.num_proposals * ncls)

        def one(i):
            props, ok = self._proposals(anchors, logits[i], deltas[i])
            rois = self._extract_rois(levels, props, batch_index=i)
            roi_logits, roi_deltas = self.box_head.apply(
                {"params": params["box"]}, rois)
            probs = jax.nn.softmax(roi_logits, -1)  # (P, ncls+1)
            boxes = jnp.clip(
                decode_deltas(props, roi_deltas, stds=RCNN_DELTA_STDS),
                0, self.image_size)
            # multiclass candidates: (P*ncls,) scores / classes, box
            # shared across a proposal's classes (class-agnostic reg)
            cand_scores = (probs[:, 1:] * ok[:, None]).reshape(-1)
            cand_cls = jnp.tile(jnp.arange(ncls), props.shape[0])
            cand_boxes = jnp.repeat(boxes, ncls, axis=0)
            top_s, top_i = jax.lax.top_k(cand_scores, nms_pre)
            cand_boxes = cand_boxes[top_i]
            cand_cls = cand_cls[top_i]
            off = cand_cls.astype(cand_boxes.dtype)[:, None] * (
                self.image_size + 1.0)
            keep, kok = nms(cand_boxes + off, top_s, 0.5,
                            self.num_proposals, score_thr=0.05)
            return (cand_boxes[keep], top_s[keep] * kok, cand_cls[keep],
                    kok)

        idxs = jnp.arange(images.shape[0])
        return jax.vmap(one)(idxs)

    def predict(self, state, images):
        return self._infer_jit(state, images, self.feature_params)


def voc_ap50(all_dets: List[Dict], all_gts: List[Dict],
             num_classes: int, iou_thr: float = 0.5) -> Dict[str, float]:
    """VOC-style AP@0.5 (area-under-PR, continuous): detections are dicts
    {boxes (D,4), scores (D,), classes (D,)}; gts {boxes (G,4),
    classes (G,), optional difficult (G,) bool} per image.

    'difficult' GT follows the official VOCdevkit protocol: such objects
    contribute nothing to the GT count, and a detection whose best-IoU
    match (>= iou_thr, over ALL class GT) is difficult is IGNORED —
    recorded as neither TP nor FP (reference's mmdet fork inherits the
    same semantics via eval_map ignore handling)."""
    aps = []
    for c in range(num_classes):
        records = []  # (score, is_tp)
        n_gt = 0
        for dets, gts in zip(all_dets, all_gts):
            gt_mask = gts["classes"] == c
            gt_boxes = gts["boxes"][gt_mask]
            diff = gts.get("difficult")
            diff = (np.asarray(diff, bool)[gt_mask] if diff is not None
                    else np.zeros(len(gt_boxes), bool))
            n_gt += int((~diff).sum())
            taken = np.zeros(len(gt_boxes), bool)
            sel = dets["classes"] == c
            order = np.argsort(-dets["scores"][sel])
            dboxes = dets["boxes"][sel][order]
            dscores = dets["scores"][sel][order]
            for box, sc in zip(dboxes, dscores):
                if sc <= 0:
                    continue
                if len(gt_boxes) == 0:
                    records.append((sc, 0))
                    continue
                # pure-numpy IoU: this is host-side metric code inside a
                # per-detection loop - a jnp call here would issue one
                # device dispatch per detection
                ix0 = np.maximum(gt_boxes[:, 0], box[0])
                iy0 = np.maximum(gt_boxes[:, 1], box[1])
                ix1 = np.minimum(gt_boxes[:, 2], box[2])
                iy1 = np.minimum(gt_boxes[:, 3], box[3])
                inter = (np.clip(ix1 - ix0, 0, None)
                         * np.clip(iy1 - iy0, 0, None))
                a_gt = ((gt_boxes[:, 2] - gt_boxes[:, 0])
                        * (gt_boxes[:, 3] - gt_boxes[:, 1]))
                a_d = (box[2] - box[0]) * (box[3] - box[1])
                ious = inter / np.maximum(a_gt + a_d - inter, 1e-9)
                j = int(np.argmax(ious))
                if ious[j] >= iou_thr:
                    if diff[j]:
                        continue  # ignore: neither TP nor FP
                    if not taken[j]:
                        taken[j] = True
                        records.append((sc, 1))
                    else:
                        records.append((sc, 0))
                else:
                    records.append((sc, 0))
        if n_gt == 0:
            continue
        records.sort(key=lambda r: -r[0])
        tps = np.cumsum([r[1] for r in records]) if records else np.array([])
        fps = np.cumsum([1 - r[1] for r in records]) if records else np.array([])
        if len(tps) == 0:
            aps.append(0.0)
            continue
        recall = tps / n_gt
        precision = tps / np.maximum(tps + fps, 1)
        # VOC "area" AP: sentinel points + monotone precision envelope
        mrec = np.concatenate([[0.0], recall, [1.0]])
        mpre = np.concatenate([[0.0], precision, [0.0]])
        mpre = np.maximum.accumulate(mpre[::-1])[::-1]
        idxs = np.where(mrec[1:] != mrec[:-1])[0]
        ap = float(np.sum((mrec[idxs + 1] - mrec[idxs]) * mpre[idxs + 1]))
        aps.append(ap)
    mAP = float(np.mean(aps)) if aps else 0.0
    return {"mAP50": mAP, "per_class_ap": aps}
