"""Learning-rate schedules matching the reference's semantics.

``CosineScheduler`` reproduces dvt/utils/misc.py:211-241 (precomputed array:
optional freeze, linear warmup via linspace, half-cycle cosine decay), and
``cosine_schedule`` provides the same curve as an optax-compatible callable
for use inside jitted update steps.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class CosineScheduler:
    """Array-backed scheduler, indexable by step (reference parity)."""

    def __init__(
        self,
        base_value: float,
        final_value: float,
        total_iters: int,
        warmup_iters: int = 0,
        start_warmup_value: float = 0.0,
        freeze_iters: int = 0,
    ):
        self.final_value = final_value
        self.total_iters = total_iters
        freeze = np.zeros(freeze_iters)
        warmup = np.linspace(start_warmup_value, base_value, warmup_iters)
        iters = np.arange(total_iters - warmup_iters - freeze_iters)
        decay = final_value + 0.5 * (base_value - final_value) * (
            1 + np.cos(np.pi * iters / max(len(iters), 1))
        )
        self.schedule = np.concatenate((freeze, warmup, decay))
        assert len(self.schedule) == total_iters

    def __getitem__(self, it: int) -> float:
        if it >= self.total_iters:
            return self.final_value
        return float(self.schedule[it])


def cosine_schedule(
    base_value: float,
    final_value: float,
    total_iters: int,
    warmup_iters: int = 0,
    start_warmup_value: float = 0.0,
):
    """Traceable schedule fn(step) -> lr with the same curve as above.

    The warmup matches np.linspace (reaches base_value at step
    ``warmup_iters - 1``), so jitted training steps agree with the
    reference's array lookup.
    """

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        denom = max(warmup_iters - 1, 1)
        warm = start_warmup_value + (base_value - start_warmup_value) * (
            step / denom
        )
        n_decay = max(total_iters - warmup_iters, 1)
        t = (step - warmup_iters) / n_decay
        decay = final_value + 0.5 * (base_value - final_value) * (
            1 + jnp.cos(jnp.pi * t)
        )
        lr = jnp.where(step < warmup_iters, warm, decay)
        return jnp.where(step >= total_iters, final_value, lr)

    return fn
