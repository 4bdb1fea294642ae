"""Benchmark: stage-2 (denoiser) and stage-3 (distillation) training
throughput on one TPU chip.

The reference trains stage 2 on cached .npy feature pairs
(main_denoiser.py, batch 256 over 8 A100s) and stage 3 as two frozen ViT
forwards + one student backward per step (main_distillation.py:235-262).
This bench measures OUR step time at several configs each, on synthetic
in-memory batches (so it isolates device step time from the host loader;
the loader's rate is reported separately by tools/ab_loader.py-style runs
in RESULTS.md).

Method: warm one step (compile), then time K dispatched steps and sync at
the end by materializing a metric (jax.block_until_ready is a no-op on
axon). Steady-state dispatches pipeline, so K-step wall / K is the
per-step cost. A device calibration (HBM GB/s + bf16 TFLOPs) prints with
every run because the tunnel chip swings between sessions.

Prints one JSON line per (stage, config): {"metric", "config", "ms_per_step",
"tokens_per_s", ...} and a final summary line.
Env: ST23_FAST=1 (tiny smoke), ST23_STEPS (default 20 / 8),
     ST23_S2_ONLY / ST23_S3_ONLY.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


CALIB_TFLOPS = None  # set in main() from the same-session calibration


def sync(x):
    import jax

    np.asarray(jax.device_get(jax.tree.leaves(x)[0]).ravel()[0])


def bench_stage2(fast: bool):
    import jax
    import jax.numpy as jnp

    from dvt_tpu.parallel.mesh import make_mesh
    from dvt_tpu.stage2 import Stage2Config, Stage2Trainer

    mesh = make_mesh()
    gh = gw = 8 if fast else 37
    dim = 64 if fast else 768
    steps = int(os.environ.get("ST23_STEPS", "4" if fast else "20"))
    results = []
    for bs in ([2] if fast else [16, 64]):
        cfg = Stage2Config(
            feat_dim=dim, noise_map_height=gh, noise_map_width=gw,
            global_batch_size=bs,
        )
        trainer = Stage2Trainer(cfg, mesh)
        rng = np.random.default_rng(0)
        raw = jnp.asarray(
            rng.standard_normal((bs, gh, gw, dim)), jnp.float32)
        den = jnp.asarray(
            rng.standard_normal((bs, gh, gw, dim)), jnp.float32)
        m = trainer.train_step(raw, den)  # compile
        sync(m["loss"])
        # settle: the FIRST post-compile execution block of a new
        # executable runs ~20x slow on axon (measured r5 decomp A/B/A/B:
        # 853 ms/step then 35 on the identical program); steady state is
        # what a 100k-iter training run sees
        for _ in range(max(steps // 2, 2)):
            m = trainer.train_step(raw, den)
        sync(m["loss"])
        t0 = time.time()
        for _ in range(steps):
            m = trainer.train_step(raw, den)
        sync(m["loss"])
        dt = (time.time() - t0) / steps
        tokens = bs * gh * gw
        # fwd+bwd ~ 3x fwd FLOPs of the num_blocks-layer transformer
        from bench import utilization, vit_fwd_flops

        flops = 3 * vit_fwd_flops(cfg.num_blocks, dim, gh * gw) * bs
        row = {
            "metric": "stage2_train_step",
            "config": {"batch": bs, "grid": f"{gh}x{gw}", "dim": dim},
            "ms_per_step": round(dt * 1e3, 2),
            "tokens_per_s": round(tokens / dt),
            "samples_per_s": round(bs / dt, 2),
            "mxu_utilization": utilization(flops, dt, CALIB_TFLOPS),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        del trainer
    return results


def bench_stage3(fast: bool):
    import jax
    import jax.numpy as jnp

    from dvt_tpu.models.vit import ViTWrapper
    from dvt_tpu.parallel.mesh import make_mesh
    from dvt_tpu.stage3 import Stage3Config, Stage3Trainer

    from bench import utilization, vit_fwd_flops

    mesh = make_mesh()
    base_steps = int(os.environ.get("ST23_STEPS", "2" if fast else "8"))
    model = "vit_base_patch14_dinov2.lvd142m"
    size = 140 if fast else 518
    wrapper = ViTWrapper(model, stride=14, seed=0)

    from dvt_tpu.models.online_denoiser import Denoiser

    den_cache = {}

    def den_params_for(gh):
        if gh not in den_cache:
            den_mod = Denoiser(
                noise_map_height=gh, noise_map_width=gh,
                feat_dim=wrapper.n_output_dims, num_blocks=1,
                dtype=jnp.bfloat16)
            den_cache[gh] = den_mod.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, gh, gh, wrapper.n_output_dims), jnp.bfloat16),
            )["params"]
        return den_cache[gh]

    # (name, batch, stride, remat, attention, steps). The stride-7/4 arms
    # are the small-stride distillation regime (5329 / 16129 tokens per
    # image) where flash attention should beat einsum SDPA — the
    # extraction-phase A/B (PLAN.md #4) showed flash's win starts >=7k
    # tokens; this measures the training-step crossover (VERDICT r3 #9).
    grids = ([("bs1", 1, 14, False, "einsum", base_steps)] if fast else [
        ("bs2_einsum", 2, 14, False, "einsum", base_steps),
        ("bs2_einsum_remat", 2, 14, True, "einsum", base_steps),
        ("bs2_flash", 2, 14, False, "flash", base_steps),
        ("bs4_einsum_remat", 4, 14, True, "einsum", base_steps),
        # recipe-scale per-device batches (the reference trains 32/GPU,
        # main_denoiser.py:176 / sample_scripts/stage3.sh; VERDICT r4 #1)
        ("bs8_einsum_remat", 8, 14, True, "einsum", base_steps),
        ("bs16_einsum_remat", 16, 14, True, "einsum", max(base_steps // 2, 2)),
        ("bs32_einsum_remat", 32, 14, True, "einsum", max(base_steps // 2, 2)),
        ("s7_bs1_einsum_remat", 1, 7, True, "einsum", 3),
        ("s7_bs1_flash_remat", 1, 7, True, "flash", 3),
        ("s4_bs1_einsum_remat", 1, 4, True, "einsum", 2),
        ("s4_bs1_flash_remat", 1, 4, True, "flash", 2),
    ])
    only = os.environ.get("ST23_GRID")  # comma-separated config names
    if only:
        names = set(only.split(","))
        grids = [g for g in grids if g[0] in names]
    results = []
    rng = np.random.default_rng(0)
    vc = wrapper.cfg
    for name, bs, stride, remat, attn, steps in grids:
        gh = (size - wrapper.patch_size) // stride + 1
        tokens_per_img = gh * gh
        cfg = Stage3Config(
            model=model, stride=stride, input_size=size,
            global_batch_size=bs, grad_checkpointing=remat,
            attention_impl=attn,
        )
        try:
            trainer = Stage3Trainer(
                cfg, mesh,
                student_params=wrapper.params,
                teacher_vit_params=wrapper.params,
                denoiser_params=den_params_for(gh),
            )
            imgs = jnp.asarray(
                rng.standard_normal((bs, size, size, 3)), jnp.float32)
            m = trainer.train_step(imgs)  # compile
            sync(m["loss"])
            # settle block (see bench_stage2): first executions of a new
            # executable are ~20x slow on axon; time steady state
            for _ in range(max(steps // 2, 2)):
                m = trainer.train_step(imgs)
            sync(m["loss"])
            t0 = time.time()
            for _ in range(steps):
                m = trainer.train_step(imgs)
            sync(m["loss"])
            dt = (time.time() - t0) / steps
            # teacher fwd (1x) + student fwd+bwd (~3x) analytic ViT FLOPs
            fwd = vit_fwd_flops(
                vc.depth, vc.embed_dim,
                tokens_per_img + vc.num_prefix_tokens, vc.mlp_ratio)
            row = {
                "metric": "stage3_train_step",
                "config": {"name": name, "batch": bs, "stride": stride,
                           "remat": remat, "attention": attn, "input": size,
                           "tokens_per_image": tokens_per_img},
                "ms_per_step": round(dt * 1e3, 1),
                "tokens_per_s": round(bs * tokens_per_img / dt),
                "images_per_s": round(bs / dt, 3),
                "mxu_utilization": utilization(
                    4 * fwd * bs, dt, CALIB_TFLOPS),
            }
            del trainer
        except Exception as e:  # noqa: BLE001 - keep later configs running
            row = {"metric": "stage3_train_step",
                   "config": {"name": name}, "error": str(e)[:200]}
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


def bench_stage3_decomp(fast: bool):
    """Decompose the stage-3 step: where do the seconds go?

    Times, as separate jitted programs on identical inputs: teacher fwd
    (ViT+denoiser), student fwd, student value_and_grad (no optimizer),
    optimizer-only (tx.update+apply on fixed grads), and the full step —
    plus the full step with buffer donation forced on (DVT_DONATE=1
    equivalent) to price the axon no-donation copy. VERDICT r4 Weak #1:
    stage-3 measured 0.39 TFLOPs while extraction on the same chip
    achieved 63.8 — this pinpoints which piece eats the gap."""
    import jax
    import jax.numpy as jnp

    from dvt_tpu.models.vit import ViTWrapper
    from dvt_tpu.models.online_denoiser import Denoiser
    from dvt_tpu.parallel.mesh import make_mesh
    from dvt_tpu.stage3 import Stage3Config, Stage3Trainer

    from bench import utilization, vit_fwd_flops

    mesh = make_mesh()
    steps = int(os.environ.get("ST23_STEPS", "2" if fast else "8"))
    model = "vit_base_patch14_dinov2.lvd142m"
    size = 140 if fast else 518
    bs = 1 if fast else int(os.environ.get("ST23_DECOMP_BS", "2"))
    wrapper = ViTWrapper(model, stride=14, seed=0)
    gh = (size - wrapper.patch_size) // 14 + 1
    den_mod = Denoiser(noise_map_height=gh, noise_map_width=gh,
                       feat_dim=wrapper.n_output_dims, num_blocks=1,
                       dtype=jnp.bfloat16)
    den_params = den_mod.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, gh, gh, wrapper.n_output_dims), jnp.bfloat16),
    )["params"]
    cfg = Stage3Config(model=model, stride=14, input_size=size,
                       global_batch_size=bs)
    trainer = Stage3Trainer(cfg, mesh, student_params=wrapper.params,
                            teacher_vit_params=wrapper.params,
                            denoiser_params=den_params)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        jnp.asarray(rng.standard_normal((bs, size, size, 3)), jnp.float32),
        trainer._data_sharding)
    vc = wrapper.cfg
    fwd = vit_fwd_flops(vc.depth, vc.embed_dim,
                        gh * gh + vc.num_prefix_tokens, vc.mlp_ratio)

    def timed(name, fn, *args, flops=None, n=steps):
        try:
            out = fn(*args)  # compile
            sync(out)
            for _ in range(max(n // 2, 2)):  # settle (axon first-exec slow)
                out = fn(*args)
            sync(out)
            t0 = time.time()
            for _ in range(n):
                out = fn(*args)
            sync(out)
            dt = (time.time() - t0) / n
            row = {"metric": "stage3_decomp", "piece": name, "batch": bs,
                   "ms": round(dt * 1e3, 1)}
            if flops:
                row["mxu_utilization"] = utilization(flops, dt, CALIB_TFLOPS)
        except Exception as e:  # noqa: BLE001
            row = {"metric": "stage3_decomp", "piece": name,
                   "error": str(e)[:200]}
        print(json.dumps(row), flush=True)
        return row

    rows = []
    imgs_c = imgs.astype(cfg.compute_dtype)
    t_fwd = jax.jit(trainer._teacher_feats)
    rows.append(timed("teacher_fwd", t_fwd, trainer.teacher, imgs_c,
                      flops=fwd * bs))
    s_fwd = jax.jit(trainer._student_feats)
    rows.append(timed("student_fwd", s_fwd, trainer.state["params"], imgs_c,
                      flops=fwd * bs))
    target = t_fwd(trainer.teacher, imgs_c)

    def _grad_only(params, images, tgt):
        from dvt_tpu.stage2 import denoise_loss

        def loss_fn(p):
            return denoise_loss(trainer._student_feats(p, images), tgt)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    g_fn = jax.jit(_grad_only)
    rows.append(timed("student_grad", g_fn, trainer.state["params"],
                      imgs_c, target, flops=3 * fwd * bs))
    (_, _), grads = g_fn(trainer.state["params"], imgs_c, target)

    import optax

    def _opt_only(state, grads):
        updates, opt_state = trainer.tx.update(
            grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state,
                "step": state["step"] + 1}

    rows.append(timed("optimizer_only", jax.jit(_opt_only),
                      jax.tree.map(jnp.copy, trainer.state),
                      jax.tree.map(jnp.copy, grads)))

    def full_step_arm(name, step_fn):
        # thread the state through each call: jit may donate argument 0
        # (safe_donate_argnums enables it off-axon), so re-passing the
        # same state object would hand deleted buffers to Execute()
        try:
            st = jax.tree.map(jnp.copy, trainer.state)
            st, m = step_fn(st, trainer.teacher, imgs)
            sync(m["loss"])
            for _ in range(max(steps // 2, 2)):  # settle
                st, m = step_fn(st, trainer.teacher, imgs)
            sync(m["loss"])
            t0 = time.time()
            for _ in range(steps):
                st, m = step_fn(st, trainer.teacher, imgs)
            sync(m["loss"])
            dt = (time.time() - t0) / steps
            row = {"metric": "stage3_decomp", "piece": name, "batch": bs,
                   "ms": round(dt * 1e3, 1),
                   "mxu_utilization": utilization(4 * fwd * bs, dt,
                                                  CALIB_TFLOPS)}
        except Exception as e:  # noqa: BLE001
            row = {"metric": "stage3_decomp", "piece": name,
                   "error": str(e)[:200]}
        print(json.dumps(row), flush=True)
        rows.append(row)

    # interleaved A/B/A/B: the tunnel swings minute to minute, so repeated
    # arms separate real program-level differences from session drift
    full_step_arm("full_step_default", trainer._step)
    full_step_arm("full_step_nodonate", jax.jit(trainer._train_step))
    full_step_arm("full_step_default_2", trainer._step)
    full_step_arm("full_step_nodonate_2", jax.jit(trainer._train_step))
    if os.environ.get("ST23_DONATE_ARM", "1") == "1":
        full_step_arm("full_step_donate",
                      jax.jit(trainer._train_step, donate_argnums=(0,)))
    return rows


def main():
    import jax

    if os.environ.get("DVT_PLATFORM"):  # axon ignores JAX_PLATFORMS
        jax.config.update("jax_platforms", os.environ["DVT_PLATFORM"])
    from bench import device_calibration, wait_for_device

    if not os.environ.get("DVT_PLATFORM"):
        wait_for_device()
    import jax.numpy as jnp

    gbps, tflops = device_calibration(jax, jnp)
    global CALIB_TFLOPS
    CALIB_TFLOPS = tflops
    fast = os.environ.get("ST23_FAST") == "1"
    out = {"device": str(jax.devices()[0]),
           "device_hbm_gbps_measured": gbps,
           "device_bf16_tflops_measured": tflops}
    if os.environ.get("ST23_DECOMP") == "1":
        out["stage3_decomp"] = bench_stage3_decomp(fast)
    else:
        if os.environ.get("ST23_S3_ONLY") != "1":
            out["stage2"] = bench_stage2(fast)
        if os.environ.get("ST23_S2_ONLY") != "1":
            out["stage3"] = bench_stage3(fast)
    print(json.dumps(out), file=sys.stderr)


if __name__ == "__main__":
    main()
