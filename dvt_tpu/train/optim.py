"""Optimizers for stages 2/3.

Reference recipe (main_denoiser.py:176-190, main_distillation.py:199-215):
AdamW(betas=(0.9, 0.999), weight_decay=1e-5), lr = blr * sqrt(global_bs/256),
CosineScheduler with 15% warmup. bf16 grads are fine on TPU; master params
stay fp32 in the optax state (no GradScaler needed - SURVEY.md 2.9).
"""

from __future__ import annotations

import math
from typing import Callable

import optax


def sqrt_scaled_lr(blr: float, global_batch_size: int) -> float:
    """blr * sqrt(total_bs / 256) (main_denoiser.py:176)."""
    return blr * math.sqrt(global_batch_size / 256.0)


def make_adamw(
    schedule: Callable,
    weight_decay: float = 1e-5,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: float | None = None,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW with optional clipping and gradient accumulation.

    ``grad_accum_steps`` > 1 reproduces the reference's DistOptimizerHook
    (evaluation/segmentation/hooks/optimizer.py:15-47): grads are averaged
    over N mini-steps and the optimizer applies every N-th call (optax
    MultiSteps; intermediate calls emit zero updates). The inner optimizer
    only ticks its schedule count once per N mini-steps, so the schedule
    is dilated by N to keep LR-vs-MINI-iteration identical to the
    reference's per-iteration LR hook."""
    tx = optax.adamw(
        learning_rate=(dilate_schedule(schedule, grad_accum_steps)
                       if grad_accum_steps > 1 else schedule),
        b1=b1, b2=b2, weight_decay=weight_decay,
    )
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


def dilate_schedule(schedule, k: int):
    """Schedule seen by an optimizer that applies once every ``k``
    mini-iterations (optax.MultiSteps): its count advances 1 per apply,
    so evaluate the base schedule at count*k to keep the LR curve aligned
    with mini-iterations."""
    if callable(schedule):
        return lambda count: schedule(count * k)
    return schedule  # constant
