"""DVT Stage 3 CLI: distill denoised features into the backbone.

TPU-native counterpart of the reference's main_distillation.py: teacher =
frozen (ViT + stage-2 denoiser); student ViT trained so its last-layer
features match the teacher's denoised output; data-parallel over the mesh
(optionally tensor-parallel for large backbones), remat standing in for
--grad_checkpointing.
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

import dvt_tpu.models.zoo as zoo


def get_args():
    p = argparse.ArgumentParser("Distill denoiser into backbone (TPU)")
    p.add_argument("--model", type=str,
                   default="vit_base_patch14_dinov2.lvd142m",
                   choices=zoo.MODEL_LIST)
    p.add_argument("--num_blocks", type=int, default=1)
    p.add_argument("--denoiser_ckpt", type=str, required=True,
                   help="stage-2 checkpoint dir (orbax) or reference .pth")
    p.add_argument("--vit_ckpt", type=str, default=None,
                   help="pretrained backbone .pth to convert+load")
    p.add_argument("--grad_checkpointing", action="store_true")
    p.add_argument("--attention_impl", type=str, default="einsum",
                   choices=("einsum", "flash"),
                   help="flash: Pallas streaming-softmax attention "
                        "(fwd + custom VJP) in teacher AND student - the "
                        "memory lever for small strides")
    p.add_argument("--tensor_parallel", action="store_true")
    p.add_argument("--sequence_parallel", type=int, default=0, metavar="M",
                   help="shard activation tokens over a model-axis of M "
                   "devices (sequence parallelism) — the memory lever for "
                   "stride<7 distillation where the N^2 score tensor OOMs "
                   "a single chip; mutually exclusive w/ --tensor_parallel")
    p.add_argument("--data_root", type=str, default="data/imagenet")
    p.add_argument("--input_size", type=int, default=518, nargs="+")
    p.add_argument("--stride_size", type=int, default=14)
    p.add_argument("--auto_stride", action="store_true")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_iterations", type=int, default=None)
    p.add_argument("--num_epochs", type=int, default=10)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--blr", type=float, default=2.0e-4)
    p.add_argument("--min_lr", type=float, default=1.0e-6)
    p.add_argument("--output_root", type=str, default="./work_dirs/")
    p.add_argument("--save_freq", type=int, default=5000)
    p.add_argument("--vis_freq", type=int, default=5000)
    p.add_argument("--num_vis_samples", type=int, default=8)
    p.add_argument("--project", type=str, default="denoising-vit")
    p.add_argument("--run_name", type=str, default="distill")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args()
    from dvt_tpu.utils.platform import normalize_input_geometry

    return normalize_input_geometry(args, zoo)


def load_denoiser_params(path):
    """Accept a reference torch .pth (converted) or our orbax dir."""
    if path.endswith(".pth"):
        from dvt_tpu.models.convert import convert_denoiser_state_dict
        from dvt_tpu.train.checkpoint import load_reference_checkpoint

        payload = load_reference_checkpoint(path)
        sd = payload.get("denoiser", payload)
        return convert_denoiser_state_dict(sd)
    from dvt_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(path)
    state = mgr.restore()
    mgr.close()
    return state["params"]


def main():
    from dvt_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # DVT_PLATFORM=cpu forces host (axon ignores JAX_PLATFORMS)

    args = get_args()
    import jax

    from dvt_tpu.data.imagefolder import ImageFolderDataset
    from dvt_tpu.data.prefetch import DataLoader
    from dvt_tpu.data.samplers import DistributedInfiniteSampler
    from dvt_tpu.models.vit import ViTWrapper
    from dvt_tpu.parallel.mesh import local_rows, make_mesh, shard_batch
    from dvt_tpu.stage3 import Stage3Config, Stage3Trainer
    from dvt_tpu.train.checkpoint import CheckpointManager
    from dvt_tpu.train.logging import MetricLogger, setup_logging

    log_dir = os.path.join(args.output_root, args.project, args.run_name)
    os.makedirs(f"{log_dir}/checkpoints", exist_ok=True)
    logger = setup_logging(log_dir)
    logger.info(" ".join(sys.argv))

    if args.sequence_parallel == 1:
        # M=1 would build a model=1 mesh where token sharding is a silent
        # no-op that still LOOKS enabled in logs/config (ADVICE r4)
        raise SystemExit(
            "--sequence_parallel requires M>=2 devices on the model axis "
            "(M=1 is a no-op); omit the flag for single-device runs")
    model_axis = (args.sequence_parallel or
                  (2 if args.tensor_parallel else 1))
    mesh = make_mesh(model=model_axis)
    n_data = mesh.shape["data"]
    global_bs = args.batch_size * n_data

    wrapper = ViTWrapper(
        args.model, stride=args.stride_size,
        checkpoint_path=args.vit_ckpt, seed=args.seed,
    )
    dataset = ImageFolderDataset(
        args.data_root, input_size=args.input_size,
        mean=wrapper.cfg.mean, std=wrapper.cfg.std,
    )
    steps_per_epoch = max(len(dataset) // global_bs, 1)
    num_iterations = args.num_iterations or steps_per_epoch * args.num_epochs

    cfg = Stage3Config(
        model=args.model,
        stride=args.stride_size,
        input_size=args.input_size[0],
        num_blocks=args.num_blocks,
        num_iterations=num_iterations,
        blr=args.blr,
        min_lr=args.min_lr,
        weight_decay=args.weight_decay,
        global_batch_size=global_bs,
        grad_checkpointing=args.grad_checkpointing,
        tensor_parallel=args.tensor_parallel,
        sequence_parallel=bool(args.sequence_parallel),
        grad_clip=args.clip_grad,
        attention_impl=args.attention_impl,
    )
    logger.info(
        f"mesh={mesh.shape} global_bs={global_bs} iters={num_iterations} "
        f"lr={cfg.lr:.2e}"
    )

    denoiser_params = load_denoiser_params(args.denoiser_ckpt)
    trainer = Stage3Trainer(
        cfg, mesh,
        student_params=wrapper.params,
        teacher_vit_params=wrapper.params,
        denoiser_params=denoiser_params,
        seed=args.seed,
    )
    ckpt = CheckpointManager(
        f"{log_dir}/checkpoints", save_interval=args.save_freq
    )
    start_step = 0
    if args.resume and ckpt.latest_step() is not None:
        trainer.state = ckpt.restore(template=trainer.state)
        start_step = int(trainer.state["step"])

    sampler = DistributedInfiniteSampler(
        len(dataset), jax.process_count(), jax.process_index()
    )
    # per-process share; shard_batch assembles the global batch
    if global_bs % jax.process_count():
        raise SystemExit(
            f"global batch {global_bs} (= --batch_size summed over "
            f"devices) must be divisible by the process count "
            f"{jax.process_count()} - each process loads an equal share")
    loader = DataLoader(
        dataset, global_bs // jax.process_count(), sampler,
        num_workers=args.num_workers,
        device_put_fn=lambda b: shard_batch(mesh, b),
    )
    metric_logger = MetricLogger(
        output_file=os.path.join(log_dir, "training_metrics.json")
    )
    for step, batch in enumerate(
        metric_logger.log_every(
            loader, 50, header="Distill", n_iterations=num_iterations,
            start_iteration=start_step,
        ),
        start=start_step,
    ):
        if step >= num_iterations:
            break
        metrics = trainer.train_step(batch["image"])
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
        # call it (a rank-0 gate would deadlock multi-host runs in the
        # commit barrier); orbax itself writes from one host
        if ckpt.should_save(step, num_iterations):
            ckpt.save(step, trainer.state)
            if jax.process_index() == 0:
                logger.info(f"saved checkpoint at step {step}")
        if jax.process_index() == 0 and (
                step % args.vis_freq == 0 or step == num_iterations - 1):
            # reference vis_freq panels (main_distillation.py:285-293):
            # teacher raw / teacher denoised target / student prediction
            from PIL import Image

            from dvt_tpu.utils.visualization import (
                visualize_online_denoised_samples,
            )

            n = min(args.num_vis_samples, global_bs)
            imgs = local_rows(batch["image"], n)
            raw, den, pred = (np.asarray(t)
                              for t in trainer.vis_features(imgs))
            std = np.asarray(wrapper.cfg.std)
            mean = np.asarray(wrapper.cfg.mean)
            panel = visualize_online_denoised_samples(
                imgs * std + mean, raw, den, pred, num_samples=n)
            os.makedirs(f"{log_dir}/visualization", exist_ok=True)
            Image.fromarray(panel).save(
                f"{log_dir}/visualization/{step:05d}.png")
            logger.info(
                f"saved visualization {log_dir}/visualization/{step:05d}.png")
    ckpt.wait()
    logger.info("done")


if __name__ == "__main__":
    main()
