"""Training-infrastructure tests: schedules, checkpointing, metric logging."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvt_tpu.train.checkpoint import CheckpointManager, strip_vit_params
from dvt_tpu.train.logging import MetricLogger, SmoothedValue
from dvt_tpu.train.optim import sqrt_scaled_lr
from dvt_tpu.train.schedules import CosineScheduler, cosine_schedule


class TestSchedules:
    def test_cosine_scheduler_reference_shape(self):
        s = CosineScheduler(
            base_value=1e-3, final_value=1e-6, total_iters=1000, warmup_iters=150
        )
        assert s[0] == 0.0
        assert np.isclose(s[149], 1e-3)
        assert s[999] < 2e-6 + 1e-3 * 0.01
        assert s[5000] == 1e-6  # past the end -> final value

    def test_traceable_matches_array_scheduler(self):
        base, final, total, warm = 2.5e-4, 1e-6, 400, 60
        arr = CosineScheduler(base, final, total, warm)
        fn = cosine_schedule(base, final, total, warm)
        for it in [0, 1, 30, 59, 60, 100, 250, 399, 500]:
            np.testing.assert_allclose(
                float(fn(jnp.asarray(it))), arr[it], rtol=1e-5, atol=1e-9
            )

    def test_sqrt_lr_scaling(self):
        # main_denoiser.py:176 with 8 GPUs x 32 batch
        assert np.isclose(sqrt_scaled_lr(2e-4, 256), 2e-4)
        assert np.isclose(sqrt_scaled_lr(2e-4, 1024), 4e-4)


class TestCheckpoint:
    def test_roundtrip_and_latest(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpts"), save_interval=5)
        state = {
            "params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.asarray(5),
        }
        mgr.save(5, state)
        state2 = {
            "params": {"w": jnp.ones((2, 3)) * 7},
            "step": jnp.asarray(10),
        }
        mgr.save(10, state2)
        mgr.wait()
        assert mgr.latest_step() == 10
        restored = mgr.restore(template=state)
        np.testing.assert_allclose(
            np.asarray(restored["params"]["w"]), np.full((2, 3), 7.0)
        )
        assert int(restored["step"]) == 10
        mgr.close()

    def test_should_save_cadence(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "c"), save_interval=5000)
        assert mgr.should_save(0, 40000)
        assert mgr.should_save(5000, 40000)
        assert not mgr.should_save(4999, 40000)
        assert mgr.should_save(39999, 40000)  # final step
        mgr.close()

    def test_strip_vit(self):
        state = {"vit": {"a": 1}, "denoiser": {"b": 2}}
        assert strip_vit_params(state) == {"denoiser": {"b": 2}}


class TestMetricLogger:
    def test_smoothed_value(self):
        v = SmoothedValue(window_size=3)
        for x in [1, 2, 3, 4]:
            v.update(x)
        assert v.value == 4
        assert v.avg == 3.0  # window [2,3,4]
        assert v.global_avg == 2.5

    def test_log_every_iterates_and_bounds(self, caplog):
        import logging

        ml = MetricLogger()
        seen = []
        with caplog.at_level(logging.INFO, logger="dvt_tpu"):
            for x in ml.log_every(range(100), 10, header="T", n_iterations=7):
                seen.append(x)
                ml.update(loss=float(x))
        assert seen == list(range(7))  # n_iterations caps the stream
        assert ml.meters["loss"].count == 7
