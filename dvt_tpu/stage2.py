"""Stage 2: train the generalizable denoiser (raw feats -> stage-1 denoised).

Reference: main_denoiser.py - a single timm Block + pos embed trained with
MSE + (1 - cosine) loss over 8 GPUs with DDP. Here the step is one jitted
SPMD program over the mesh: batch sharded on 'data', params replicated;
XLA inserts the gradient all-reduce. Loss/metric cross-device reduction is
just the sharded-mean XLA emits - no hand-written allreduce.

Recipe parity (main_denoiser.py:176-226): AdamW betas (0.9, 0.999), wd 1e-5,
lr = blr*sqrt(global_bs/256), CosineScheduler 15% warmup to min_lr, 40k
iters, non-finite-loss guard.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from dvt_tpu.models.offline_denoiser import cosine_similarity
from dvt_tpu.parallel.mesh import safe_donate_argnums
from dvt_tpu.models.online_denoiser import Denoiser
from dvt_tpu.train.optim import make_adamw, sqrt_scaled_lr
from dvt_tpu.train.schedules import cosine_schedule

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Stage2Config:
    feat_dim: int = 768
    noise_map_height: int = 37
    noise_map_width: int = 37
    num_blocks: int = 1
    num_iterations: int = 40_000
    blr: float = 2.0e-4
    min_lr: float = 1.0e-6
    weight_decay: float = 1e-5
    warmup_frac: float = 0.15
    global_batch_size: int = 256
    grad_clip: Any = None
    grad_accum_steps: int = 1  # optax.MultiSteps over mini-batches
    compute_dtype: Any = jnp.float32

    @property
    def lr(self) -> float:
        return sqrt_scaled_lr(self.blr, self.global_batch_size)

    @property
    def warmup_iters(self) -> int:
        return int(self.num_iterations * self.warmup_frac)

    def module(self) -> Denoiser:
        return Denoiser(
            noise_map_height=self.noise_map_height,
            noise_map_width=self.noise_map_width,
            feat_dim=self.feat_dim,
            num_blocks=self.num_blocks,
            dtype=self.compute_dtype,
        )


def denoise_loss(pred: Array, target: Array) -> Tuple[Array, Dict[str, Array]]:
    """MSE + (1 - cos) on (B, h, w, C) maps (main_denoiser.py:214-217)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    l2 = jnp.mean((pred - target) ** 2)
    cos = 1.0 - jnp.mean(cosine_similarity(pred, target))
    loss = l2 + cos
    return loss, {"l2_loss": l2, "cosine_similarity_loss": cos, "loss": loss}


class Stage2Trainer:
    def __init__(self, cfg: Stage2Config, mesh, seed: int = 42):
        self.cfg = cfg
        self.mesh = mesh
        self.module = cfg.module()
        self.schedule = cosine_schedule(
            cfg.lr, cfg.min_lr, cfg.num_iterations, cfg.warmup_iters
        )
        self.tx = make_adamw(self.schedule, cfg.weight_decay,
                             grad_clip=cfg.grad_clip,
                             grad_accum_steps=cfg.grad_accum_steps)

        dummy = jnp.zeros(
            (1, cfg.noise_map_height, cfg.noise_map_width, cfg.feat_dim),
            cfg.compute_dtype,
        )
        params = self.module.init(jax.random.PRNGKey(seed), dummy)["params"]
        opt_state = self.tx.init(params)
        repl = NamedSharding(mesh, P())
        self.state = jax.device_put(
            {"params": params, "opt_state": opt_state, "step": jnp.zeros((), jnp.int32)},
            repl,
        )

        data_sh = NamedSharding(mesh, P("data"))
        self._step = jax.jit(
            self._train_step,
            in_shardings=(repl, (data_sh, data_sh)),
            out_shardings=(repl, repl),
            donate_argnums=safe_donate_argnums(0),
        )

    def _train_step(self, state, batch):
        original_feats, denoised_feats = batch

        def loss_fn(params):
            pred = self.module.apply(
                {"params": params}, original_feats.astype(self.cfg.compute_dtype)
            )
            return denoise_loss(pred, denoised_feats)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        updates, opt_state = self.tx.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        metrics["lr"] = self.schedule(state["step"])
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        return new_state, metrics

    def train_step(self, original_feats: Array, denoised_feats: Array):
        """One SPMD step; returns host-side metric dict."""
        self.state, metrics = self._step(
            self.state, (original_feats, denoised_feats)
        )
        return metrics

    def predict(self, original_feats: Array) -> Array:
        # jitted: an eager apply dispatches every op individually, which
        # costs seconds per batch on high-dispatch-latency backends
        if not hasattr(self, "_predict_jit"):
            self._predict_jit = jax.jit(
                lambda params, x: self.module.apply({"params": params}, x)
            )
        return self._predict_jit(
            self.state["params"],
            original_feats.astype(self.cfg.compute_dtype),
        )
