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
        """Reference cadence (it+1) % save_freq: first save after
        save_interval steps; NEVER the untrained step 0."""
        mgr = CheckpointManager(str(tmp_path / "c"), save_interval=5000)
        assert not mgr.should_save(0, 40000)
        assert mgr.should_save(4999, 40000)
        assert not mgr.should_save(5000, 40000)
        assert mgr.should_save(9999, 40000)
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


def test_grad_accum_schedule_tracks_mini_iterations():
    """With accumulation N, the inner optimizer ticks its count once per N
    mini-steps; the dilated schedule keeps LR-vs-mini-iteration aligned
    with the reference's per-iteration LR hook (an undailated schedule
    would stretch warmup/decay by N)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dvt_tpu.train.optim import dilate_schedule, make_adamw

    sched = lambda step: 1e-2 * (1.0 + step)  # strictly increasing
    assert float(dilate_schedule(sched, 4)(3)) == float(sched(12))

    w0 = jnp.ones((2, 2))
    g = jnp.ones((2, 2))

    def lr_seen(tx, applies, k):
        """Applied update magnitude per optimizer apply (Adam with
        constant grads -> |update| == lr)."""
        st = tx.init(w0)
        w = w0
        mags = []
        for _ in range(applies * k):
            upd, st = tx.update(g, st, w)
            m = float(jnp.max(jnp.abs(upd[0] if isinstance(upd, tuple)
                                      else upd)))
            if m > 0:
                mags.append(m)
            w = optax.apply_updates(w, upd)
        return mags

    k = 4
    mags_accum = lr_seen(make_adamw(sched, 0.0, grad_accum_steps=k), 3, k)
    mags_plain = lr_seen(make_adamw(sched, 0.0), 12, 1)
    # apply j of the accumulated optimizer should use the lr of
    # mini-iteration j*k, not of iteration j
    np.testing.assert_allclose(
        mags_accum, [mags_plain[j * k] for j in range(3)], rtol=1e-5
    )


def test_grad_accum_matches_big_batch():
    """optax.MultiSteps in make_adamw: N accumulated mini-steps == one step
    on the concatenated batch (DistOptimizerHook semantics,
    evaluation/segmentation/hooks/optimizer.py:15-47)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dvt_tpu.train.optim import make_adamw

    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
    xs = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    ys = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))
    sched = lambda step: 1e-2

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    # accumulated: 2 mini-batches of 4
    tx = make_adamw(sched, weight_decay=0.0, grad_accum_steps=2)
    st = tx.init(w0)
    w = w0
    for i in range(2):
        g = jax.grad(loss)(w, xs[i * 4:(i + 1) * 4], ys[i * 4:(i + 1) * 4])
        upd, st = tx.update(g, st, w)
        w = optax.apply_updates(w, upd)

    # single step on the full batch
    tx1 = make_adamw(sched, weight_decay=0.0)
    st1 = tx1.init(w0)
    g = jax.grad(loss)(w0, xs, ys)
    upd, st1 = tx1.update(g, st1, w0)
    w1 = optax.apply_updates(w0, upd)

    np.testing.assert_allclose(np.asarray(w), np.asarray(w1),
                               rtol=1e-6, atol=1e-7)


def test_seg_probe_grad_accum_runs():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvt_tpu.eval.seg import SegLinearProbe

    rng = np.random.default_rng(1)
    probe = SegLinearProbe(lambda x: x, num_classes=4, grad_accum_steps=2,
                           total_iters=10, warmup_iters=1)
    feats = jnp.asarray(rng.standard_normal((2, 6, 6, 8)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (2, 6, 6)).astype(np.int32))
    state = probe.init_state(feats)
    for _ in range(4):
        state, m = probe.train_step(state, feats, labels)
    assert np.isfinite(float(m["loss"]))
