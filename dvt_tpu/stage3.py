"""Stage 3: distill denoised features back into the backbone.

Reference: main_distillation.py - teacher = frozen (ViT + stage-2 denoiser),
student = the same ViT trained so its last-layer features match the teacher's
denoised output (MSE + 1-cos), over ImageNet with DDP.

TPU design: one jitted SPMD step over the mesh. Teacher and student both run
inside the step (the teacher under stop_gradient), so the heaviest stage is a
single XLA program: two ViT forwards + one backward, batch-sharded on 'data',
optionally tensor-parallel over 'model' for large backbones, with
``jax.checkpoint`` on blocks standing in for torch grad checkpointing
(main_distillation.py:150-152).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from dvt_tpu.models.online_denoiser import denoiser_from_params
from dvt_tpu.models.vit import VisionTransformer
from dvt_tpu.models.zoo import ViTConfig, get_model_config
from dvt_tpu.parallel.mesh import safe_donate_argnums
from dvt_tpu.parallel.sharding import shard_params
from dvt_tpu.stage2 import denoise_loss
from dvt_tpu.train.optim import make_adamw, sqrt_scaled_lr
from dvt_tpu.train.schedules import cosine_schedule

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Stage3Config:
    model: str = "vit_base_patch14_dinov2.lvd142m"
    stride: int = 14
    input_size: int = 518
    num_blocks: int = 1  # unused by the trainer: teacher depth comes
    # from the stage-2 checkpoint itself (denoiser_from_params)
    num_iterations: int = 100_000
    blr: float = 2.0e-4
    min_lr: float = 1.0e-6
    weight_decay: float = 1e-5
    warmup_frac: float = 0.15
    global_batch_size: int = 256
    grad_checkpointing: bool = False
    tensor_parallel: bool = False
    # Sequence parallelism: shard activation TOKENS over the mesh 'model'
    # axis (models/vit.py seq_axis) so the per-device attention score
    # memory drops from B*H*N^2 to B*H*(N/m)*N. The lever for stride<7
    # distillation — at stride 4 (16k tokens) a ViT-B score tensor is
    # ~6 GB/layer bf16 and a single chip OOMs with einsum AND flash
    # (RESULTS.md §8b); sharded over model=8 it is <1 GB/layer. Mutually
    # exclusive with tensor_parallel (both consume the 'model' axis).
    sequence_parallel: bool = False
    grad_clip: Any = None
    grad_accum_steps: int = 1  # optax.MultiSteps over mini-batches
    compute_dtype: Any = jnp.bfloat16
    # "flash" uses the Pallas flash-attention kernel (fwd + custom VJP) in
    # both teacher and student - the memory lever for small-stride
    # distillation (SURVEY.md 5.7)
    attention_impl: str = "einsum"
    # Explicit architecture override: when set, used instead of the zoo
    # lookup by ``model`` (tiny architectures for dryruns/tests).
    vit_cfg_override: Any = None

    @property
    def vit_cfg(self) -> ViTConfig:
        if self.vit_cfg_override is not None:
            return self.vit_cfg_override
        return get_model_config(self.model)

    @property
    def feat_grid(self):
        p = self.vit_cfg.patch_size
        g = (self.input_size - p) // self.stride + 1
        return (g, g)

    @property
    def lr(self) -> float:
        return sqrt_scaled_lr(self.blr, self.global_batch_size)

    @property
    def warmup_iters(self) -> int:
        return int(self.num_iterations * self.warmup_frac)


class Stage3Trainer:
    """Distillation over the mesh.

    State: student params (trainable). Teacher params (ViT + denoiser) are
    captured as frozen inputs. The student's forward taps the last layer with
    norm=True, exactly like model.forward = get_intermediate_layers in the
    reference (main_distillation.py:158-160).
    """

    def __init__(
        self,
        cfg: Stage3Config,
        mesh,
        student_params,
        teacher_vit_params,
        denoiser_params,
        seed: int = 42,  # deprecated, unused: all params are passed in
    ):
        del seed
        self.cfg = cfg
        self.mesh = mesh
        vit_cfg = cfg.vit_cfg
        if cfg.sequence_parallel and cfg.tensor_parallel:
            raise ValueError(
                "sequence_parallel and tensor_parallel both shard over the "
                "'model' mesh axis — pick one per run")
        self.vit = VisionTransformer(
            vit_cfg,
            stride=cfg.stride,
            dtype=cfg.compute_dtype,
            remat=cfg.grad_checkpointing,
            attention_impl=cfg.attention_impl,
            seq_mesh=mesh if cfg.sequence_parallel else None,
            seq_axis="model" if cfg.sequence_parallel else None,
        )
        # Teacher static config DERIVED FROM THE CHECKPOINT (depth from
        # blocks_N entries, grid from pos_embed - which the module
        # resamples to the runtime grid at apply time). Building from
        # cfg.num_blocks would SILENTLY truncate a deeper stage-2
        # checkpoint to the configured depth (flax ignores unused params)
        # and crash the pos-embed resample on a grid mismatch.
        self.denoiser = denoiser_from_params(
            denoiser_params, vit_cfg.embed_dim, dtype=cfg.compute_dtype)
        self.schedule = cosine_schedule(
            cfg.lr, cfg.min_lr, cfg.num_iterations, cfg.warmup_iters
        )
        self.tx = make_adamw(self.schedule, cfg.weight_decay,
                             grad_clip=cfg.grad_clip,
                             grad_accum_steps=cfg.grad_accum_steps)

        tp = cfg.tensor_parallel
        student_params = shard_params(mesh, student_params, tp)
        opt_state = self.tx.init(student_params)
        self.state = {
            "params": student_params,
            "opt_state": opt_state,
            "step": jax.device_put(
                jnp.zeros((), jnp.int32), NamedSharding(mesh, P())
            ),
        }
        teacher_vit = shard_params(mesh, teacher_vit_params, tp)
        # the usual init passes the SAME arrays as student and teacher
        # (main_distillation.py: both from one ViTWrapper); the train step
        # donates the student state, and a donated buffer appearing again
        # as the teacher argument in the same Execute() is an XLA error
        # ("attempt to use a buffer that was previously donated"). The
        # aliasing survives shard_params (device_put reuses committed
        # buffers), so give the teacher its own copy unconditionally —
        # a one-time ViT-sized allocation.
        teacher_vit = jax.tree.map(jnp.copy, teacher_vit)
        self.teacher = {
            "vit": teacher_vit,
            "denoiser": shard_params(mesh, denoiser_params, False),
        }

        # state/teacher arrays are already placed on the mesh (shard_params
        # + tx.init inherit shardings); let jit follow the data. Only the
        # incoming image batch needs an explicit sharding.
        self._data_sharding = NamedSharding(mesh, P("data"))
        self._step = jax.jit(
            self._train_step, donate_argnums=safe_donate_argnums(0)
        )

    def _student_feats(self, params, images):
        return self.vit.apply({"params": params}, images, norm=True)[-1]

    def _teacher_feats(self, teacher, images):
        raw = self.vit.apply({"params": teacher["vit"]}, images, norm=True)[-1]
        den = self.denoiser.apply({"params": teacher["denoiser"]}, raw)
        return jax.lax.stop_gradient(den)

    def _train_step(self, state, teacher, images):
        images = images.astype(self.cfg.compute_dtype)
        target = self._teacher_feats(teacher, images)

        def loss_fn(params):
            pred = self._student_feats(params, images)
            return denoise_loss(pred, target)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        updates, opt_state = self.tx.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        metrics["lr"] = self.schedule(state["step"])
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            {"params": params, "opt_state": opt_state, "step": state["step"] + 1},
            metrics,
        )

    def train_step(self, images: Array) -> Dict[str, Array]:
        images = jax.device_put(images, self._data_sharding)
        self.state, metrics = self._step(self.state, self.teacher, images)
        return metrics

    def _vis(self, state, teacher, images):
        images = images.astype(self.cfg.compute_dtype)
        raw = self.vit.apply({"params": teacher["vit"]}, images,
                             norm=True)[-1]
        den = self.denoiser.apply({"params": teacher["denoiser"]}, raw)
        pred = self._student_feats(state["params"], images)
        return (raw.astype(jnp.float32), den.astype(jnp.float32),
                pred.astype(jnp.float32))

    def vis_features(self, images: Array):
        """(teacher raw, teacher denoised target, student pred) fp32 maps
        for the reference's vis_freq panels (main_distillation.py:285-293).
        ``images`` should be process-local (rank 0 renders its own)."""
        if not hasattr(self, "_vis_jit"):
            self._vis_jit = jax.jit(self._vis)
        return self._vis_jit(self.state, self.teacher, jnp.asarray(images))
