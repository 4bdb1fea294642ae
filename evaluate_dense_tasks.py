"""Dense-task evaluation CLI: VOC/ADE segmentation + NYU depth linear probes.

TPU-native counterpart of the reference's evaluate_dense_tasks.py without the
mmcv/mmseg stack: builds the frozen feature extractor in one of three modes
(raw ViT / ViT + stage-2 denoiser / distilled ViT, reference :183-214),
trains the matching linear probe (BNHead seg or binned depth head) with the
shipped recipes, runs slide (seg) or whole (depth) inference on the val
split, and appends metrics to <work_dir>/eval_metrics.json for
collect_results.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

import dvt_tpu.models.zoo as zoo

TASKS = {
    "voc": dict(num_classes=21, reduce_zero_label=False,
                img_dir="JPEGImages", ann_dir="SegmentationClass",
                train_split="ImageSets/Segmentation/train.txt",
                val_split="ImageSets/Segmentation/val.txt",
                img_suffix=".jpg", iters=40_000, lr=1e-3, wd=1e-4),
    "ade20k": dict(num_classes=150, reduce_zero_label=True,
                   img_dir="images/training", ann_dir="annotations/training",
                   val_img_dir="images/validation",
                   val_ann_dir="annotations/validation",
                   train_split=None, val_split=None,
                   img_suffix=".jpg", iters=40_000, lr=1e-3, wd=1e-4),
    # NYU recipe: vitb_nyu_linear_config.py:184-199 (AdamW lr 5e-3 wd 0.01,
    # cosine annealing with 12.8k-iter warmup, 38.4k iters)
    "nyu": dict(iters=38_400, lr=5e-3, wd=0.01),
    # ViTDet Faster-RCNN probe on SimpleFPN: the reference's det config
    # (vitb_voc2012_vitdet_config.py:78-115: AdamW lr 1e-4 wd 0.1, 24k
    # iters) is unrunnable as shipped upstream (mmdet base config absent);
    # this task is the runnable equivalent (dvt_tpu/eval/detection.py).
    "voc_det": dict(iters=24_000, lr=1e-4, wd=0.1),
}


def get_args():
    p = argparse.ArgumentParser("Dense-task eval (TPU)")
    p.add_argument("task", choices=list(TASKS))
    p.add_argument("--model", type=str,
                   default="vit_base_patch14_dinov2.lvd142m",
                   choices=zoo.MODEL_LIST)
    p.add_argument("--stride_size", type=int, default=None,
                   help="default: patch size")
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--work_dir", type=str, default="./work_dirs/eval")
    p.add_argument("--vit_ckpt", type=str, default=None,
                   help="backbone weights (.pth converted, or distilled)")
    p.add_argument("--denoiser_ckpt", type=str, default=None,
                   help="stage-2 denoiser: evaluate ViT+denoiser mode")
    p.add_argument("--feature_root", type=str, default=None,
                   help="seg only: train/eval the probe directly on cached "
                        "stage-1 .npy feature dumps (the reference's "
                        "PascalVOCFeatureDataset path) instead of running "
                        "the backbone; e.g. "
                        "<save_root>/denoised_features/<model>")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_iterations", type=int, default=None)
    p.add_argument("--eval_interval", type=int, default=10_000)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--max_val_images", type=int, default=None)
    p.add_argument("--save_maps", action="store_true",
                   help="seg: write palette-painted prediction pngs to "
                        "<work_dir>/maps/ at each eval (reference "
                        "colormaps.py equivalents, eval/colormaps.py)")
    p.add_argument("--depth_head", type=str, default="linear",
                   choices=("linear", "dpt", "dpt_reference"),
                   help="nyu probe head: linear BNHead (reference recipe), "
                        "DPT (TPU-fast bilinear reassembles), or the "
                        "torch-checkpoint-compatible DPT variant")
    p.add_argument("--depth_inference", type=str, default="whole",
                   choices=("whole", "slide"),
                   help="nyu val inference mode: whole image (the shipped "
                        "NYU recipe) or slide windows averaged on a stride "
                        "grid (DepthEncoderDecoder.slide, reference "
                        "evaluation/depth/models/depther/"
                        "encoder_decoder.py:146-259)")
    p.add_argument("--depth_crop", type=int, nargs=2, default=(480, 480),
                   help="slide mode window size (h w)")
    p.add_argument("--depth_stride", type=int, nargs=2, default=(320, 320),
                   help="slide mode window stride (h w)")
    p.add_argument("--seg_window_batch", type=int, default=8,
                   help="slide-inference windows stacked per jitted call "
                        "(batched + mesh-sharded val inference)")
    p.add_argument("--flip_tta", action="store_true",
                   help="hflip test-time augmentation: average softmax "
                        "(seg) / depth maps over the flipped pass "
                        "(MultiScaleFlipAug flip=True; the shipped "
                        "reference configs use flip=False)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt_interval", type=int, default=2000,
                   help="save the probe state (params/opt_state/step) every "
                        "N iters to <work_dir>/checkpoints (orbax, rolling "
                        "keep-3) so long runs survive chip faults; 0 "
                        "disables saving")
    p.add_argument("--resume_from", type=str, default=None,
                   help="checkpoint directory to resume the probe from "
                        "(restores the latest step; the mmcv --resume-from "
                        "counterpart, reference evaluate_dense_tasks.py:40)")
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the latest checkpoint under "
                        "<work_dir>/checkpoints when one exists (the mmcv "
                        "--auto-resume counterpart, reference "
                        "evaluate_dense_tasks.py:100-128)")
    p.add_argument("--det_proposals", type=int, default=300,
                   help="voc_det: RPN proposals kept after NMS; the NMS "
                        "loop is sequential, so smaller values shrink the "
                        "jitted step (useful on watchdog-limited chips)")
    p.add_argument("--det_roi_sample", type=int, default=128,
                   help="voc_det: RoIs sampled for the box head per step")
    p.add_argument("--det_window_size", type=int, default=0,
                   help="voc_det: window every backbone block's attention "
                        "over NxN tiles (ViTDet adapter, evaluation/vitdet/"
                        "vision_transformer.py:98-117); 0 = global "
                        "attention; window >= feature grid is exactly "
                        "global")
    p.add_argument("--det_add_pe", action="store_true",
                   help="voc_det: add the fixed 2-D sin-cos pos embed to "
                        "the backbone map inside SimpleFPN (the _pe config "
                        "variant, vitb_voc2012_vitdet_pe_config.py:72-73)")
    return p.parse_args()


class ProbeCheckpointer:
    """Probe-training resume: the mmcv ``--resume-from``/``--auto-resume``
    counterpart (reference evaluate_dense_tasks.py:40,100-128 via
    ``IterBasedRunner.resume``). Saves the full probe state (head params,
    optimizer state, step) every ``ckpt_interval`` iters with the orbax
    manager; on resume restores the latest step and truncates
    ``eval_metrics.json`` entries PAST the restored step so the metrics
    stream stays consistent with the trajectory actually trained (evals
    between the restored checkpoint and the crash get re-run).

    Data-order caveat (same as mmcv's IterBasedRunner): the infinite
    sampler restarts from its seed on resume, so the post-resume batch
    sequence differs from the uninterrupted run; params/opt_state/LR/step
    resume exactly.
    """

    def __init__(self, args, total: int, metrics_path: str, logger):
        from dvt_tpu.train.checkpoint import CheckpointManager

        self.total = total
        self.interval = int(args.ckpt_interval or 0)
        self.logger = logger
        self.start = 0
        self._mgr = None
        ckpt_dir = args.resume_from or os.path.join(
            args.work_dir, "checkpoints")
        want_resume = bool(args.resume_from) or args.auto_resume
        if self.interval > 0 or want_resume:
            self._mgr = CheckpointManager(
                ckpt_dir, max_to_keep=3,
                save_interval=max(self.interval, 1))
        if want_resume:
            latest = self._mgr.latest_step()
            if latest is not None:
                self.start = int(latest)
                logger.info(f"resuming probe from step {latest} ({ckpt_dir})")
                self._truncate_metrics(metrics_path, latest)
            elif args.resume_from:
                raise FileNotFoundError(
                    f"--resume_from {ckpt_dir}: no checkpoints found")
            else:
                logger.info(f"--auto_resume: no checkpoint in {ckpt_dir}, "
                            "starting fresh")

    @staticmethod
    def _truncate_metrics(path: str, step: int) -> None:
        if not os.path.exists(path):
            return
        with open(path) as f:
            lines = [ln for ln in f if ln.strip()]
        kept = [ln for ln in lines
                if json.loads(ln).get("iteration", 0) <= step]
        if len(kept) != len(lines):
            with open(path, "w") as f:
                f.writelines(kept)

    def restore(self, template):
        """Restore the latest state over a freshly-initialized template
        (orbax needs the tree structure + shardings to restore into)."""
        return self._mgr.restore(self.start, template=template)

    def maybe_save(self, step: int, state) -> None:
        if self.interval > 0 and self._mgr.should_save(step, self.total):
            self._mgr.save(step + 1, state)

    def close(self) -> None:
        if self._mgr is not None:
            self._mgr.wait()
            self._mgr.close()


def build_feature_fn(args, return_cls_token: bool = False, out_indices=None,
                     window_size: int = 0):
    import jax.numpy as jnp

    from dvt_tpu.eval.glue import make_feature_fn
    from dvt_tpu.models.vit import ViTWrapper

    stride = args.stride_size or zoo.patch_size_of(args.model)
    wrapper = ViTWrapper(
        args.model, stride=stride, checkpoint_path=args.vit_ckpt,
        dtype=jnp.bfloat16, seed=args.seed, window_size=window_size,
    )
    denoiser = denoiser_params = None
    if args.denoiser_ckpt:
        from main_distillation import load_denoiser_params

        from dvt_tpu.models.online_denoiser import denoiser_from_params

        denoiser_params = load_denoiser_params(args.denoiser_ckpt)
        denoiser = denoiser_from_params(
            denoiser_params, wrapper.n_output_dims, dtype=jnp.bfloat16)
    fn, fparams = make_feature_fn(
        wrapper, denoiser, denoiser_params,
        pad_multiple=wrapper.patch_size,
        return_cls_token=return_cls_token,
        out_indices=out_indices,
    )
    return fn, fparams, wrapper


def build_mesh():
    """Data-parallel mesh over all local devices (the reference evals run
    torchrun x8, evaluation/depth/apis/train.py:61-66). None on one device."""
    import jax

    if jax.device_count() <= 1:
        return None
    from dvt_tpu.parallel.mesh import make_mesh

    return make_mesh(data=jax.device_count())


def run_seg(args, cfg):
    import jax.numpy as jnp

    from dvt_tpu.data.prefetch import DataLoader
    from dvt_tpu.data.samplers import InfiniteSampler
    from dvt_tpu.eval.datasets import SegDataset
    from dvt_tpu.eval.seg import SegLinearProbe, ConfusionAccumulator
    from dvt_tpu.train.logging import MetricLogger, setup_logging

    logger = setup_logging(args.work_dir)
    feature_fn, fparams, wrapper = build_feature_fn(args)

    train_ds = SegDataset(
        args.data_root, cfg["img_dir"], cfg["ann_dir"],
        split=cfg.get("train_split"), img_suffix=cfg["img_suffix"],
        reduce_zero_label=cfg["reduce_zero_label"], train=True, seed=args.seed,
    )
    val_ds = SegDataset(
        args.data_root,
        cfg.get("val_img_dir", cfg["img_dir"]),
        cfg.get("val_ann_dir", cfg["ann_dir"]),
        split=cfg.get("val_split"), img_suffix=cfg["img_suffix"],
        reduce_zero_label=cfg["reduce_zero_label"], train=False,
    )
    logger.info(f"train {len(train_ds)} / val {len(val_ds)} images")

    probe = SegLinearProbe(
        feature_fn, cfg["num_classes"], feature_params=fparams,
        mesh=build_mesh(),
        lr=cfg["lr"], weight_decay=cfg["wd"],
        total_iters=args.num_iterations or cfg["iters"], seed=args.seed,
    )
    loader = DataLoader(
        train_ds, args.batch_size, InfiniteSampler(len(train_ds)),
        num_workers=args.num_workers,
    )
    total = args.num_iterations or cfg["iters"]
    ml = MetricLogger(output_file=os.path.join(args.work_dir, "train_log.json"))
    state = None
    metrics_path = os.path.join(args.work_dir, "eval_metrics.json")

    def evaluate(state, step):
        from dvt_tpu.eval.seg import slide_inference_batched
        from dvt_tpu.eval.tta import softmax_np

        acc = ConfusionAccumulator(cfg["num_classes"])
        n = len(val_ds) if args.max_val_images is None else min(
            len(val_ds), args.max_val_images
        )
        # batched + mesh-sharded val inference: windows from a chunk of
        # images are stacked and run through ONE jitted logits call per
        # window_batch (the depth eval's pattern; the reference evals are
        # 8-way DDP, evaluation/depth/apis/train.py:61-66). Per-window
        # loops measured ~4 dispatch rounds/image on VOC — this cuts that
        # by ~window_batch at identical mIoU (eval BN never mixes rows).
        img_chunk = max(args.seg_window_batch * 4, 8)
        for c0 in range(0, n, img_chunk):
            idxs = list(range(c0, min(c0 + img_chunk, n)))
            items = [val_ds[i] for i in idxs]
            imgs = [it["image"] for it in items]
            if args.flip_tta:
                # MultiScaleFlipAug(flip=True) semantics: run the full
                # slide pass on the hflipped image too, flip logits back,
                # average softmax probabilities (encoder_decoder.py:229-261)
                imgs = imgs + [im[:, ::-1] for im in imgs]
            logit_maps = slide_inference_batched(
                lambda b: probe.predict_logits(state, b),
                imgs, cfg["num_classes"],
                window_batch=args.seg_window_batch,
            )
            for j, (i, item) in enumerate(zip(idxs, items)):
                # mmseg protocol: bilinear-resize LOGITS to the label's
                # native resolution, THEN argmax (encoder_decoder.py
                # whole/slide both resize seg_logit to ori_shape before
                # softmax/argmax) - nearest-resizing the argmax map
                # quantizes boundaries and shifts mIoU
                from dvt_tpu.utils.visualization import _bilinear_resize

                def to_ori(lm, shape=item["label"].shape):
                    return (lm if lm.shape[:2] == shape
                            else _bilinear_resize(lm, shape))

                if args.flip_tta:
                    probs = (softmax_np(to_ori(logit_maps[j]))
                             + softmax_np(to_ori(
                                 logit_maps[j + len(items)][:, ::-1])))
                    pred = probs.argmax(-1).astype(np.int64)
                else:
                    pred = to_ori(logit_maps[j]).argmax(-1).astype(np.int64)
                acc.add(pred, np.asarray(item["label"], np.int64))
                if args.save_maps:
                    from PIL import Image

                    from dvt_tpu.eval.colormaps import (
                        paint_label_map, palette_for)

                    os.makedirs(os.path.join(args.work_dir, "maps"),
                                exist_ok=True)
                    Image.fromarray(
                        paint_label_map(pred, palette_for(args.task))
                    ).save(os.path.join(args.work_dir, "maps",
                                        f"iter{step}_{i:04d}.png"))
        res = acc.results()
        res["iteration"] = step
        with open(metrics_path, "a") as f:
            f.write(json.dumps(res) + "\n")
        logger.info(f"[eval @ {step}] {res}")
        return res

    ckpt = ProbeCheckpointer(args, total, metrics_path, logger)
    for i, batch in enumerate(
        ml.log_every(loader, 50, header="SegProbe",
                     n_iterations=total - ckpt.start)
    ):
        step = ckpt.start + i
        if state is None:
            state = probe.init_state(jnp.asarray(batch["image"]))
            if ckpt.start:
                state = ckpt.restore(state)
        if step >= total:
            break
        state, m = probe.train_step(
            state, jnp.asarray(batch["image"]), jnp.asarray(batch["label"])
        )
        ml.update(loss=float(m["loss"]), lr=float(m["lr"]))
        if (step + 1) % args.eval_interval == 0 or step == total - 1:
            evaluate(state, step + 1)
        # save AFTER the eval boundary: a completed step-(s+1) checkpoint
        # implies every eval <= s+1 finished appending, so resume-side
        # truncation keeps eval_metrics.json consistent
        ckpt.maybe_save(step, state)
    ckpt.close()


def run_seg_features(args, cfg):
    """Linear probe trained DIRECTLY on cached stage-1 feature dumps - the
    reference's PascalVOCFeatureDataset / LoadFeaturesFromFile path
    (evaluation/segmentation/datasets/dataset_feature_wrapper.py:9-68,
    pipelines/loading.py:10-99). No backbone runs; whole-feature inference."""
    import jax.numpy as jnp

    from dvt_tpu.data.prefetch import DataLoader
    from dvt_tpu.data.samplers import InfiniteSampler
    from dvt_tpu.eval.datasets import SegFeatureDataset
    from dvt_tpu.eval.seg import ConfusionAccumulator, SegLinearProbe
    from dvt_tpu.train.logging import MetricLogger, setup_logging

    logger = setup_logging(args.work_dir)
    train_ds = SegFeatureDataset(
        args.feature_root, args.data_root, cfg["ann_dir"],
        split=cfg.get("train_split"),
        reduce_zero_label=cfg["reduce_zero_label"], label_size=(512, 512),
    )
    val_ds = SegFeatureDataset(
        args.feature_root, args.data_root,
        cfg.get("val_ann_dir", cfg["ann_dir"]), split=cfg.get("val_split"),
        reduce_zero_label=cfg["reduce_zero_label"],
    )
    logger.info(f"[cached features] train {len(train_ds)} / val {len(val_ds)}")

    probe = SegLinearProbe(
        lambda feats: feats, cfg["num_classes"], mesh=build_mesh(),
        lr=cfg["lr"], weight_decay=cfg["wd"],
        total_iters=args.num_iterations or cfg["iters"], seed=args.seed,
    )
    loader = DataLoader(
        train_ds, args.batch_size, InfiniteSampler(len(train_ds)),
        num_workers=args.num_workers,
    )
    total = args.num_iterations or cfg["iters"]
    ml = MetricLogger(output_file=os.path.join(args.work_dir, "train_log.json"))
    metrics_path = os.path.join(args.work_dir, "eval_metrics.json")
    state = None

    def evaluate(state, step):
        acc = ConfusionAccumulator(cfg["num_classes"])
        n = len(val_ds) if args.max_val_images is None else min(
            len(val_ds), args.max_val_images
        )
        for i in range(n):
            item = val_ds[i]
            logits = np.asarray(probe.predict_logits(
                state, jnp.asarray(item["feature"][None])
            ))[0]
            # mmseg protocol: bilinear logits -> label resolution, THEN
            # argmax (feature-grid argmax + nearest upsample produced
            # 14-px-quantized prediction maps)
            if logits.shape[:2] != item["label"].shape:
                from dvt_tpu.utils.visualization import _bilinear_resize

                logits = _bilinear_resize(logits, item["label"].shape)
            acc.add(logits.argmax(-1).astype(np.int64),
                    np.asarray(item["label"], np.int64))
        res = acc.results()
        res["iteration"] = step
        with open(metrics_path, "a") as f:
            f.write(json.dumps(res) + "\n")
        logger.info(f"[eval @ {step}] {res}")

    ckpt = ProbeCheckpointer(args, total, metrics_path, logger)
    for i, batch in enumerate(
        ml.log_every(loader, 50, header="SegFeatProbe",
                     n_iterations=total - ckpt.start)
    ):
        step = ckpt.start + i
        if state is None:
            state = probe.init_state(jnp.asarray(batch["feature"]))
            if ckpt.start:
                state = ckpt.restore(state)
        if step >= total:
            break
        state, m = probe.train_step(
            state, jnp.asarray(batch["feature"]), jnp.asarray(batch["label"])
        )
        ml.update(loss=float(m["loss"]), lr=float(m["lr"]))
        if (step + 1) % args.eval_interval == 0 or step == total - 1:
            evaluate(state, step + 1)
        ckpt.maybe_save(step, state)
    ckpt.close()


def run_depth(args, cfg):
    import jax.numpy as jnp

    from dvt_tpu.data.prefetch import DataLoader
    from dvt_tpu.data.samplers import InfiniteSampler
    from dvt_tpu.eval.datasets import NYUDepthDataset
    from dvt_tpu.eval.depth import DepthLinearProbe, depth_metrics, eigen_crop_mask
    from dvt_tpu.train.logging import MetricLogger, setup_logging

    logger = setup_logging(args.work_dir)
    dpt = args.depth_head != "linear"
    if dpt:
        # DPT head taps 4 depths (the DPT-ViT convention; the reference's
        # DPTHead ships without a config — dvt_tpu/eval/dpt.py)
        depth_total = zoo.get_model_config(args.model).depth
        taps = tuple(round((i + 1) * depth_total / 4) - 1 for i in range(4))
        feature_fn, fparams, wrapper = build_feature_fn(
            args, out_indices=taps)
        use_cls = False
    else:
        # depth probes feed the head (patch map, cls token) pairs
        # (vitb_nyu_linear_config.py:147, eval_utils/misc.py:159-188)
        feature_fn, fparams, wrapper = build_feature_fn(
            args, return_cls_token=True)
        use_cls = True
    train_ds = NYUDepthDataset(
        args.data_root, "nyu_train.txt", train=True, seed=args.seed
    )
    val_ds = NYUDepthDataset(args.data_root, "nyu_test.txt", train=False)
    logger.info(f"train {len(train_ds)} / val {len(val_ds)} images")

    mesh = build_mesh()
    probe = DepthLinearProbe(
        feature_fn, feature_params=fparams, mesh=mesh,
        use_cls_token=use_cls, head_type=args.depth_head,
        lr=cfg["lr"], weight_decay=cfg["wd"],
        total_iters=args.num_iterations or cfg["iters"], seed=args.seed,
    )
    loader = DataLoader(
        train_ds, args.batch_size, InfiniteSampler(len(train_ds)),
        num_workers=args.num_workers,
    )
    total = args.num_iterations or cfg["iters"]
    ml = MetricLogger(output_file=os.path.join(args.work_dir, "train_log.json"))
    metrics_path = os.path.join(args.work_dir, "eval_metrics.json")
    state = None

    def evaluate(state, step):
        """Batched val inference (NYU val images share one shape, so whole
        batches run in one dispatch, data-sharded over the mesh); per-image
        metric dicts with empty eigen-crop masks are skipped rather than
        poisoning the epoch average."""
        sums, n, skipped = {}, 0, 0
        count = len(val_ds) if args.max_val_images is None else min(
            len(val_ds), args.max_val_images
        )
        eval_bs = max(args.batch_size, 1)
        pending = []  # (image, depth)
        mask_cache = {}

        def flush():
            nonlocal n, skipped
            if not pending:
                return
            imgs = np.stack([p[0] for p in pending])
            if args.depth_inference == "slide":
                # slide windows averaged on the stride grid
                # (DepthEncoderDecoder.slide, encoder_decoder.py:146-259);
                # per-image host loop like the seg slide
                from dvt_tpu.eval.depth import depth_slide_inference

                pfn = lambda b: probe.predict(state, b)
                preds = np.stack([
                    depth_slide_inference(pfn, im, crop=tuple(args.depth_crop),
                                          stride=tuple(args.depth_stride))
                    for im in imgs])
                if args.flip_tta:
                    pf = np.stack([
                        depth_slide_inference(
                            pfn, im[:, ::-1], crop=tuple(args.depth_crop),
                            stride=tuple(args.depth_stride))
                        for im in imgs])
                    preds = (preds + pf[:, :, ::-1]) / 2.0
            else:
                # probe.predict pads the batch to a data-axis multiple (and
                # trims) internally, so any batch size is safe here
                preds = np.asarray(probe.predict(state, jnp.asarray(imgs)))
                if args.flip_tta:
                    # depth TTA averages predicted maps directly
                    # (depth/models/depther/encoder_decoder.py:146-259)
                    pf = np.asarray(probe.predict(
                        state, jnp.asarray(imgs[:, :, ::-1])))
                    preds = (preds + pf[:, :, ::-1]) / 2.0
            for (img, gt), pred in zip(pending, preds):
                shape = gt.shape
                if shape not in mask_cache:
                    mask_cache[shape] = eigen_crop_mask(shape)
                m = depth_metrics(gt, pred, eval_mask=mask_cache[shape])
                if any(np.isnan(v) for v in m.values()):
                    skipped += 1
                    continue
                for k, v in m.items():
                    sums[k] = sums.get(k, 0.0) + v
                n += 1
            pending.clear()

        last_shape = None
        for i in range(count):
            item = val_ds[i]
            if "depth" not in item:
                continue
            shape = item["image"].shape
            if pending and (shape != last_shape or len(pending) >= eval_bs):
                flush()
            pending.append((item["image"], item["depth"]))
            last_shape = shape
        flush()
        res = {k: v / max(n, 1) for k, v in sums.items()}
        res["iteration"] = step
        res["num_images"] = n
        if skipped:
            res["skipped_nan"] = skipped
        with open(metrics_path, "a") as f:
            f.write(json.dumps(res) + "\n")
        logger.info(f"[eval @ {step}] {res}")

    ckpt = ProbeCheckpointer(args, total, metrics_path, logger)
    for i, batch in enumerate(
        ml.log_every(loader, 50, header="DepthProbe",
                     n_iterations=total - ckpt.start)
    ):
        step = ckpt.start + i
        if state is None:
            state = probe.init_state(jnp.asarray(batch["image"]))
            if ckpt.start:
                state = ckpt.restore(state)
        if step >= total:
            break
        state, m = probe.train_step(
            state, jnp.asarray(batch["image"]), jnp.asarray(batch["depth"])
        )
        ml.update(loss=float(m["loss"]), lr=float(m["lr"]))
        if (step + 1) % args.eval_interval == 0 or step == total - 1:
            evaluate(state, step + 1)
        ckpt.maybe_save(step, state)
    ckpt.close()


def run_det(args, cfg):
    """ViTDet-style detection probe: frozen backbone -> SimpleFPN ->
    RPN + box head, VOC AP@0.5 (dvt_tpu/eval/detection.py; reference
    intent: evaluation/configs/vitb_voc2012_vitdet_config.py)."""
    import jax
    import jax.numpy as jnp

    from dvt_tpu.data.prefetch import DataLoader
    from dvt_tpu.data.samplers import InfiniteSampler
    from dvt_tpu.eval.datasets import VOCDetectionDataset
    from dvt_tpu.eval.detection import FasterRCNNProbe, voc_ap50
    from dvt_tpu.train.logging import MetricLogger, setup_logging

    logger = setup_logging(args.work_dir)
    feature_fn, fparams, wrapper = build_feature_fn(
        args, window_size=args.det_window_size)
    train_ds = VOCDetectionDataset(args.data_root, "train", train=True,
                                   seed=args.seed)
    val_ds = VOCDetectionDataset(args.data_root, "val", train=False,
                                 classes=train_ds.classes)
    logger.info(
        f"train {len(train_ds)} / val {len(val_ds)} images, "
        f"{train_ds.num_classes} classes"
    )
    total = args.num_iterations or cfg["iters"]
    probe = FasterRCNNProbe(
        feature_fn, train_ds.num_classes, feature_params=fparams,
        input_stride=args.stride_size or wrapper.patch_size,
        lr=cfg["lr"], weight_decay=cfg["wd"], total_iters=total,
        num_proposals=args.det_proposals, roi_sample=args.det_roi_sample,
        add_pe=args.det_add_pe, seed=args.seed,
    )
    loader = DataLoader(
        train_ds, args.batch_size, InfiniteSampler(len(train_ds)),
        num_workers=args.num_workers,
    )
    ml = MetricLogger(output_file=os.path.join(args.work_dir, "train_log.json"))
    metrics_path = os.path.join(args.work_dir, "eval_metrics.json")
    state = None

    def evaluate(state, step):
        n = len(val_ds) if args.max_val_images is None else min(
            len(val_ds), args.max_val_images)
        dets, gts = [], []
        for i in range(n):
            item = val_ds[i]
            boxes, scores, classes, ok = probe.predict(
                state, jnp.asarray(item["image"][None]))
            # mmdet test_cfg semantics: score_thr 0.05 then top
            # max_per_img=100 by score (models/faster_rcnn_r50_fpn.py)
            sc = np.asarray(scores[0])
            keep = np.asarray(ok[0]) & (sc > 0.05)
            if keep.sum() > 100:
                # exact top-100 (ties at the cutoff must not all survive)
                idx = np.nonzero(keep)[0]
                top = idx[np.argsort(sc[idx])[-100:]]
                keep = np.zeros_like(keep)
                keep[top] = True
            dets.append({
                "boxes": np.asarray(boxes[0])[keep],
                "scores": sc[keep],
                "classes": np.asarray(classes[0])[keep],
            })
            # full un-truncated GT (incl. difficult beyond the train-side
            # max_boxes cap) so the AP ignore set is complete
            gts.append({
                "boxes": item["eval_boxes"],
                "classes": item["eval_classes"],
                "difficult": item["eval_difficult"],
            })
        res = voc_ap50(dets, gts, train_ds.num_classes)
        res = {"mAP50": res["mAP50"], "iteration": step, "num_images": n}
        with open(metrics_path, "a") as f:
            f.write(json.dumps(res) + "\n")
        logger.info(f"[eval @ {step}] {res}")

    key = jax.random.PRNGKey(args.seed)
    ckpt = ProbeCheckpointer(args, total, metrics_path, logger)
    for i, batch in enumerate(
        ml.log_every(loader, 50, header="DetProbe",
                     n_iterations=total - ckpt.start)
    ):
        step = ckpt.start + i
        if state is None:
            state = probe.init_state(jnp.asarray(batch["image"]))
            if ckpt.start:
                state = ckpt.restore(state)
        if step >= total:
            break
        state, m = probe.train_step(
            state, jax.random.fold_in(key, step),
            jnp.asarray(batch["image"]), jnp.asarray(batch["boxes"]),
            jnp.asarray(batch["labels"]), jnp.asarray(batch["valid"]),
        )
        ml.update(loss=float(m["loss"]), lr=float(m["lr"]))
        if (step + 1) % args.eval_interval == 0 or step == total - 1:
            evaluate(state, step + 1)
        ckpt.maybe_save(step, state)
    ckpt.close()


def main():
    from dvt_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # DVT_PLATFORM=cpu forces host (axon ignores JAX_PLATFORMS)

    args = get_args()
    os.makedirs(args.work_dir, exist_ok=True)
    cfg = TASKS[args.task]
    if args.task in ("voc", "ade20k"):
        if args.feature_root:
            run_seg_features(args, cfg)
        else:
            run_seg(args, cfg)
    elif args.task == "voc_det":
        run_det(args, cfg)
    else:
        run_depth(args, cfg)


if __name__ == "__main__":
    main()
