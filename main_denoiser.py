"""DVT Stage 2 CLI: train the generalizable denoiser on stage-1 outputs.

TPU-native counterpart of the reference's main_denoiser.py: one transformer
block mapping raw -> stage-1-denoised features, trained data-parallel over
the device mesh with the same recipe (sqrt-scaled LR, AdamW, cosine schedule
with 15% warmup, NaN guard, periodic checkpoints + visualization).
"""

import argparse
import logging
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

import dvt_tpu.models.zoo as zoo


def get_args():
    p = argparse.ArgumentParser("Train generalizable denoiser (TPU)")
    p.add_argument("--model", type=str,
                   default="vit_base_patch14_dinov2.lvd142m",
                   choices=zoo.MODEL_LIST)
    p.add_argument("--num_blocks", type=int, default=1)
    p.add_argument("--data_root", type=str, default="data/voc")
    p.add_argument("--feat_root", type=str, default=None)
    p.add_argument("--data_list_path", type=str, default=None)
    p.add_argument("--input_size", type=int, default=518, nargs="+")
    p.add_argument("--stride_size", type=int, default=14)
    p.add_argument("--auto_stride", action="store_true")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=32,
                   help="per-device batch size")
    p.add_argument("--num_iterations", type=int, default=40_000)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--blr", type=float, default=2.0e-4)
    p.add_argument("--min_lr", type=float, default=1.0e-6)
    p.add_argument("--output_root", type=str, default="./work_dirs/")
    p.add_argument("--save_freq", type=int, default=5000)
    p.add_argument("--vis_freq", type=int, default=5000)
    p.add_argument("--num_vis_samples", type=int, default=8)
    p.add_argument("--project", type=str, default="denoising-vit")
    p.add_argument("--run_name", type=str, default="debug")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args()
    from dvt_tpu.utils.platform import normalize_input_geometry

    return normalize_input_geometry(args, zoo)


def main():
    from dvt_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # DVT_PLATFORM=cpu forces host (axon ignores JAX_PLATFORMS)

    args = get_args()
    import jax

    from dvt_tpu.data.paired_list import PairedListDataset
    from dvt_tpu.data.prefetch import DataLoader
    from dvt_tpu.data.samplers import DistributedInfiniteSampler
    from dvt_tpu.models.zoo import get_model_config
    from dvt_tpu.parallel.mesh import local_rows, make_mesh, shard_batch
    from dvt_tpu.stage2 import Stage2Config, Stage2Trainer
    from dvt_tpu.train.checkpoint import CheckpointManager
    from dvt_tpu.train.logging import MetricLogger, setup_logging
    from dvt_tpu.utils.visualization import visualize_online_denoised_samples

    log_dir = os.path.join(args.output_root, args.project, args.run_name)
    os.makedirs(f"{log_dir}/checkpoints", exist_ok=True)
    os.makedirs(f"{log_dir}/visualization", exist_ok=True)
    logger = setup_logging(log_dir)
    logger.info(" ".join(sys.argv))

    vit_cfg = get_model_config(args.model)
    gh = (args.input_size[0] - vit_cfg.patch_size) // args.stride_size + 1
    gw = (args.input_size[1] - vit_cfg.patch_size) // args.stride_size + 1

    mesh = make_mesh()
    n_dev = mesh.devices.size
    global_bs = args.batch_size * n_dev
    cfg = Stage2Config(
        feat_dim=vit_cfg.embed_dim,
        noise_map_height=gh,
        noise_map_width=gw,
        num_blocks=args.num_blocks,
        num_iterations=args.num_iterations,
        blr=args.blr,
        min_lr=args.min_lr,
        weight_decay=args.weight_decay,
        global_batch_size=global_bs,
        grad_clip=args.clip_grad,
    )
    logger.info(f"mesh={mesh.shape} global_bs={global_bs} lr={cfg.lr:.2e}")
    trainer = Stage2Trainer(cfg, mesh, seed=args.seed)
    ckpt = CheckpointManager(
        f"{log_dir}/checkpoints", save_interval=args.save_freq
    )
    start_step = 0
    if args.resume and ckpt.latest_step() is not None:
        trainer.state = ckpt.restore(template=trainer.state)
        start_step = int(trainer.state["step"])
        logger.info(f"resumed from step {start_step}")

    # include_image=False: the train step consumes only the feature pair;
    # images are decoded on demand at vis steps (image_for_index), which
    # removes the per-batch JPEG decode + 518^2 bicubic from the host
    # loader's critical path (measured in tools/ab_overlap.py)
    dataset = PairedListDataset(
        data_root=args.data_root,
        data_list=args.data_list_path,
        feat_root=args.feat_root,
        input_size=args.input_size,
        mean=vit_cfg.mean,
        std=vit_cfg.std,
        include_image=False,
    )
    logger.info(f"dataset size: {len(dataset)}")
    sampler = DistributedInfiniteSampler(
        len(dataset), jax.process_count(), jax.process_index()
    )
    # each process loads only its share; shard_batch assembles the global
    # batch from the per-process rows (multi-host) or device_puts (1 host)
    if global_bs % jax.process_count():
        raise SystemExit(
            f"global batch {global_bs} (= --batch_size summed over "
            f"devices) must be divisible by the process count "
            f"{jax.process_count()} - each process loads an equal share")
    local_bs = global_bs // jax.process_count()
    loader = DataLoader(
        dataset, local_bs, sampler, num_workers=args.num_workers,
        device_put_fn=lambda b: shard_batch(mesh, b),
    )

    metric_logger = MetricLogger(
        output_file=os.path.join(log_dir, "training_metrics.json")
    )
    for step, batch in enumerate(
        metric_logger.log_every(
            loader, 50, header="Train", n_iterations=args.num_iterations,
            start_iteration=start_step,
        ),
        start=start_step,
    ):
        if step >= args.num_iterations:
            break
        metrics = trainer.train_step(
            batch["original_feats"], batch["denoised_feats"]
        )
        loss = float(metrics["loss"])
        if not np.isfinite(loss):
            logger.error(f"Loss is {loss}, stopping training")
            sys.exit(1)
        metric_logger.update(
            loss=loss,
            l2_loss=float(metrics["l2_loss"]),
            cosine_similarity_loss=float(metrics["cosine_similarity_loss"]),
            grad_norm=float(metrics["grad_norm"]),
            lr=float(metrics["lr"]),
        )
        # orbax save is a cross-process collective: EVERY process must
        # call it (a rank-0 gate deadlocks multi-host runs in the commit
        # barrier - the stage-3 CLI documents the same); orbax itself
        # writes from one host
        if ckpt.should_save(step, args.num_iterations):
            ckpt.save(step, trainer.state)
            if jax.process_index() == 0:
                logger.info(f"saved checkpoint at step {step}")
        if jax.process_index() == 0 and (
                step % args.vis_freq == 0
                or step == args.num_iterations - 1):
            # process-LOCAL rows: eagerly slicing a multi-host global
            # array raises on non-addressable shards
            n = args.num_vis_samples
            raw_l = local_rows(batch["original_feats"], n)
            den_l = local_rows(batch["denoised_feats"], n)
            idx_l = np.asarray(local_rows(batch["index"], n))
            images = np.stack(
                [dataset.image_for_index(int(i)) for i in idx_l])
            pred = np.asarray(trainer.predict(raw_l))
            std = np.asarray(vit_cfg.std)
            mean = np.asarray(vit_cfg.mean)
            panel = visualize_online_denoised_samples(
                images * std + mean, raw_l, den_l, pred,
                num_samples=n,
            )
            from PIL import Image

            Image.fromarray(panel).save(
                f"{log_dir}/visualization/{step:05d}.png"
            )
    ckpt.wait()
    logger.info("done")


if __name__ == "__main__":
    main()
