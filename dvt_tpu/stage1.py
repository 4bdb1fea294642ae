"""Stage 1: per-image artifact decomposition, TPU-style.

The reference fits ONE image per GPU process (sample_scripts/stage1.sh,
main_img_denoising.py:28-146): 768 ViT views -> 25k Adam steps on a tiny
(field + artifact + residual) model. On TPU the idiomatic win is to keep the
whole 25k-step fit inside a single compiled ``lax.scan`` with zero host
traffic; ``vmap`` over a batch of independent images is supported and
measured ~94% per-image efficient (N=4 1.80 vs N=1 1.69 ms/iter/image,
RESULTS.md §9d), so the fit is row-count/HBM-bound and a single chip gains
nothing from in-chip concurrency — throughput scales by sharding the image
LIST across chips/hosts (``--num_shards/--shard_id``), one fit per chip.

Faithfulness notes (all vs main_img_denoising.py):
  * Adam(lr cosine 0.01 -> 0.001, warmup 2500, eps=1e-15, betas (0.9, 0.99),
    additive L2 weight decay 1e-5)  (:48-55, misc.py:306-322).
  * 2048 random pixels per step from the (num_views+1) x h x w pool (:73-76).
  * At 50% of steps G's gradient is masked and the residual predictor's loss
    terms activate (:70-72) - expressed as traced gates so one XLA program
    covers both phases.
  * The artifact term G is sampled at the same full [-1,1] grid for every
    view (:59-64), i.e. exactly at its own grid points, so the bilinear
    grid_sample degenerates to a gather by (pixel mod h*w); we exploit that
    in the fit loop (ops/grid_sample.py still provides the general op).
  * Export: denoised = field(full-grid coords), raw = raw_features[-1]
    (:121-146).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dvt_tpu.models.neural_field import NeuralFeatureField, default_hash_spec
from dvt_tpu.models.offline_denoiser import SingleImageDenoiser, cosine_similarity

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Stage1Config:
    feat_dim: int = 768
    noise_map_height: int = 37
    noise_map_width: int = 37
    n_levels: int = 16
    num_views: int = 768
    num_iters: int = 25000
    warmup_iters: int = 2500
    lr: float = 0.01
    min_lr: float = 0.001
    weight_decay: float = 1e-5
    pixel_bsz: int = 2048
    freeze_shared_artifacts_after: float = 0.5
    enable_residual_predictor: bool = True
    compute_dtype: Any = jnp.float32
    # Adam moment storage. With the fused Pallas optimizer the moments are
    # read/written exactly once per step, so bf16 halves that HBM traffic for
    # free (fp32 master params; update math runs fp32 in-kernel).
    moments_dtype: Any = jnp.bfloat16
    # "fused": the Adam update as ONE flat XLA expression per leaf
    #   (ops/fused_adam.py fused_adam_update_xla) - XLA fuses it into a
    #   single HBM pass, measured marginally FASTER than the hand-written
    #   Pallas kernel (1.9 vs 2.1 ms/step on the big table; the kernel
    #   gains nothing because XLA's elementwise fusion is already optimal
    #   here). Also carries torch-exact freeze semantics.
    # "pallas": the explicit Pallas kernel (ops/fused_adam.py) - kept as a
    #   measured artifact and for layouts XLA mishandles.
    # "optax": the reference-shaped optax chain (oracle for equivalence
    #   tests).
    optimizer_impl: str = "fused"
    # Levels with <= this many table entries run as one-hot interpolation
    # matmuls (MXU fwd + transposed-matmul bwd) instead of gather/scatter,
    # which is row-count-bound on TPU. Tuned on-device (PLAN.md).
    matmul_level_threshold: int = 4096
    # Sample ONE corner per (pixel, level) with bilinear-weight probability
    # on the gather-path levels (unbiased; 4x fewer scatter rows). Export
    # and eval always use exact blending.
    stochastic_corners: bool = False
    # Deferred table sweep: run the dense Adam sweep over the hash table
    # (a table-sized HBM pass, ~1/3 of the measured step cost - PLAN.md)
    # once every K steps, on the SUM of the K steps' sparse row gradients
    # (collected as (row, value) pairs; no dense grad materializes in
    # between). The small leaves (field MLP, artifact map, residual MLP)
    # keep exact per-step Adam. K=1 is numerically the standard fused path
    # (equivalence-tested). Requires optimizer_impl "fused"/"pallas" and
    # chunk lengths divisible by K.
    table_sweep_every: int = 1
    # lr multiplier for the deferred table sweeps. Adam's step size is
    # invariant to gradient scale, so K accumulated steps move the table
    # ~1/K as far per wall-clock step; K compensates (one big step
    # integrating K unit steps). Quality-validated on device (PLAN.md).
    table_sweep_lr_scale: float | None = None  # None -> table_sweep_every
    # Level dropout: sample this many of the Lg gather levels per step
    # (subsample_fine_levels; kept levels scaled Lg/keep, dropped slots
    # zero). 0 = off. Cuts the row-count-bound gather/scatter
    # proportionally; full-grid export always uses every level. Runs on
    # the deferred-sweep path (any table_sweep_every, incl. 1).
    level_sample: int = 0

    @property
    def sweep_lr_scale(self) -> float:
        if self.table_sweep_lr_scale is None:
            return float(self.table_sweep_every)
        return self.table_sweep_lr_scale

    @property
    def grid_hw(self) -> Tuple[int, int]:
        return (self.noise_map_height, self.noise_map_width)

    @property
    def pool_size(self) -> int:
        return (self.num_views + 1) * self.noise_map_height * self.noise_map_width

    def modules(self):
        denoiser = SingleImageDenoiser(
            noise_map_height=self.noise_map_height,
            noise_map_width=self.noise_map_width,
            feat_dim=self.feat_dim,
            enable_residual_predictor=self.enable_residual_predictor,
            dtype=self.compute_dtype,
        )
        field = NeuralFeatureField(
            feat_dim=self.feat_dim,
            spec=default_hash_spec(self.n_levels, self.matmul_level_threshold),
            dtype=self.compute_dtype,
        )
        return denoiser, field


def make_patch_coordinates(height: int, width: int, start: float = -1.0,
                           end: float = 1.0) -> Array:
    """(H, W, 2) grid of (x, y) coords; matches main_img_denoising.py:21-26."""
    ys = jnp.linspace(start, end, height)
    xs = jnp.linspace(start, end, width)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def lr_at(cfg: Stage1Config, step: Array) -> Array:
    """Linear warmup then half-cycle cosine (dvt/utils/misc.py:306-322)."""
    step = step.astype(jnp.float32)
    warm = cfg.lr * step / max(cfg.warmup_iters, 1)
    t = (step - cfg.warmup_iters) / max(cfg.num_iters - cfg.warmup_iters, 1)
    cos = cfg.min_lr + (cfg.lr - cfg.min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    return jnp.where(step < cfg.warmup_iters, warm, cos)


def _scale_by_adam(b1: float, b2: float, eps: float, moments_dtype):
    """scale_by_adam with configurable moment storage dtype (both m and v).

    Matches optax/torch Adam arithmetic; moments are stored in
    ``moments_dtype`` and promoted to fp32 for the update math.
    """

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=moments_dtype)
        return {
            "mu": jax.tree.map(zeros, params),
            "nu": jax.tree.map(zeros, params),
            "count": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params=None):
        count = state["count"] + 1
        mu = jax.tree.map(
            lambda m, g: (b1 * m.astype(jnp.float32)
                          + (1 - b1) * g.astype(jnp.float32)),
            state["mu"], grads,
        )
        nu = jax.tree.map(
            lambda v, g: (b2 * v.astype(jnp.float32)
                          + (1 - b2) * jnp.square(g.astype(jnp.float32))),
            state["nu"], grads,
        )
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        updates = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps),
            mu, nu,
        )
        new_state = {
            "mu": jax.tree.map(lambda m: m.astype(moments_dtype), mu),
            "nu": jax.tree.map(lambda v: v.astype(moments_dtype), nu),
            "count": count,
        }
        return updates, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: Stage1Config) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: additive L2 before the Adam moments."""
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        _scale_by_adam(0.9, 0.99, 1e-15, cfg.moments_dtype),
        optax.scale_by_learning_rate(lambda step: lr_at(cfg, step)),
    )


def _phase_frozen_mask(params, phase2):
    """Per-leaf traced freeze flags reproducing the torch reference's
    parameter-participation schedule (main_img_denoising.py:70-72,
    offline_denoiser.py:49-60):

    * the shared artifact map G is frozen in phase 2
      (``requires_grad_(False)`` upstream: param AND moments untouched);
    * the residual predictor h is frozen in phase 1 - its loss terms are
      gated off, so every gradient is exactly zero, and torch Adam SKIPS
      None-grad params entirely. Without the freeze, additive weight
      decay inside Adam turns g = wd*p into ~sign(p)*lr steps that
      destroy h's initialization before phase 2 ever starts.

    ``params`` may be the full param tree or the deferred-path "small"
    tree - anything with a ``denoiser`` subtree."""
    frozen = jax.tree.map(lambda _: False, params)
    den = frozen["denoiser"]
    den["shared_artifacts"] = phase2
    phase1 = jnp.logical_not(phase2)
    for k in ("res_0", "res_2", "res_4"):
        if k in den:
            den[k] = jax.tree.map(lambda _: phase1, den[k])
    return frozen


def _optax_apply_frozen(opt, params, grads, opt_state, frozen):
    """optax chain update with torch ``requires_grad_(False)`` freeze
    semantics: frozen leaves keep their param value AND Adam moments
    (zeroing the gradient alone is not enough - add_decayed_weights
    re-adds wd*p and the momentum tail keeps moving the leaf)."""
    updates, new_state = opt.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    restore = lambda f, n, o: jnp.where(f, o, n)
    new_params = jax.tree.map(restore, frozen, new_params, params)
    adam_new, adam_old = new_state[1], opt_state[1]
    adam = {
        "mu": jax.tree.map(restore, frozen, adam_new["mu"], adam_old["mu"]),
        "nu": jax.tree.map(restore, frozen, adam_new["nu"], adam_old["nu"]),
        "count": adam_new["count"],
    }
    return new_params, (new_state[0], adam, new_state[2])


def fused_adam_apply(cfg: Stage1Config, params, grads, opt_state, step,
                     frozen_mask=None):
    """Single-HBM-pass Adam step over the param tree (ops/fused_adam.py).

    Matches the optax chain in ``make_optimizer`` (additive L2, betas
    (0.9, 0.99), eps 1e-15, warmup+cosine lr) but each leaf is updated by
    one fused kernel: read (param, m, v, grad), write (param, m, v).

    ``frozen_mask``: optional pytree of bools (or a traced bool per leaf);
    where True, the leaf's param AND moments are left untouched - the
    torch semantics of ``requires_grad_(False)`` mid-fit (the reference
    freezes the shared artifact map at 50% of iters,
    main_img_denoising.py:70-72 + offline_denoiser.py:49-60).
    """
    from dvt_tpu.ops.fused_adam import fused_adam_update, fused_adam_update_xla

    update = (fused_adam_update
              if (cfg.optimizer_impl == "pallas"
                  and jax.default_backend() == "tpu")
              else fused_adam_update_xla)
    lr = lr_at(cfg, step)
    count = (opt_state["count"] + 1).astype(jnp.float32)

    flat_p, treedef = jax.tree.flatten(params)
    flat_m = treedef.flatten_up_to(opt_state["mu"])
    flat_v = treedef.flatten_up_to(opt_state["nu"])
    flat_g = treedef.flatten_up_to(grads)
    if frozen_mask is None:
        flat_f = [None] * len(flat_p)
    else:
        flat_f = treedef.flatten_up_to(frozen_mask)

    new_p, new_m, new_v = [], [], []
    for p, m, v, g, fz in zip(flat_p, flat_m, flat_v, flat_g, flat_f):
        p2, m2, v2 = update(p, m, v, g, lr, count,
                            b1=0.9, b2=0.99, eps=1e-15,
                            wd=cfg.weight_decay)
        if fz is not None:
            keep = jnp.asarray(fz)
            p2 = jnp.where(keep, p, p2)
            m2 = jnp.where(keep, m, m2)
            v2 = jnp.where(keep, v, v2)
        new_p.append(p2)
        new_m.append(m2)
        new_v.append(v2)

    new_state = {
        "mu": jax.tree.unflatten(treedef, new_m),
        "nu": jax.tree.unflatten(treedef, new_v),
        "count": opt_state["count"] + 1,
    }
    return jax.tree.unflatten(treedef, new_p), new_state


def init_fit(key: Array, cfg: Stage1Config):
    """Initialize (params, opt_state) for one image's fit."""
    denoiser, field = cfg.modules()
    kd, kf = jax.random.split(key)
    dummy_feats = jnp.zeros((8, cfg.feat_dim), cfg.compute_dtype)
    dummy_coords = jnp.zeros((8, 2), jnp.float32)
    d_params = denoiser.init(
        kd, dummy_feats, dummy_feats, dummy_coords, phase2=False
    )["params"]
    f_params = field.init(kf, dummy_coords)["params"]
    params = {"denoiser": d_params, "field": f_params}
    if cfg.optimizer_impl in ("fused", "pallas"):
        zeros = lambda p: jnp.zeros_like(p, dtype=cfg.moments_dtype)
        opt_state = {
            "mu": jax.tree.map(zeros, params),
            "nu": jax.tree.map(zeros, params),
            "count": jnp.zeros((), jnp.int32),
        }
    else:
        opt_state = make_optimizer(cfg).init(params)
    return params, opt_state


def _denoiser_losses(dparams, cfg: Stage1Config, denoised, raw,
                     artifact_flat_idx, phase2, denoiser=None):
    """Loss arithmetic of SingleImageDenoiser.__call__ given the field output.

    ``dparams``: the denoiser param subtree (shared_artifacts + residual MLP);
    ``denoised``: (B, C) field prediction at the minibatch coords;
    ``raw``: (B, C); ``artifact_flat_idx``: (B,) pixel position within its
    view grid (G is sampled at exact grid points == gather, module docstring);
    ``denoiser``: the cfg.modules() instance (constructed here if absent so
    there is exactly one construction path for the loss arithmetic).
    """
    g = dparams["shared_artifacts"].reshape(-1, cfg.feat_dim)
    shared = g[artifact_flat_idx].astype(raw.dtype)

    d = denoiser if denoiser is not None else cfg.modules()[0]

    use_res = cfg.enable_residual_predictor
    gate = jnp.asarray(phase2, raw.dtype)
    if use_res:
        res = d.apply(
            {"params": dparams}, raw, method=lambda m, x: m._residual(x)
        )
    pred = denoised + shared
    if use_res:
        pred = pred + gate * jax.lax.stop_gradient(res)
    patch_l2 = jnp.mean((pred - raw) ** 2)
    cos = 1.0 - jnp.mean(cosine_similarity(pred, raw))
    loss = patch_l2 + cos
    metrics = {"patch_l2_loss": patch_l2, "cosine_similarity_loss": cos}
    if use_res:
        gt_res = jax.lax.stop_gradient(raw - denoised - shared)
        res_loss = 0.1 * jnp.mean((res - gt_res) ** 2)
        sparsity = 0.02 * jnp.mean(jnp.abs(res))
        loss = loss + gate * (res_loss + sparsity)
        # gated, matching SingleImageDenoiser.__call__'s reported metric
        metrics["residual_loss"] = gate * res_loss
    metrics["loss"] = loss
    return loss, metrics


def _loss_fn(params, cfg: Stage1Config, denoiser, field, raw, global_coords,
             artifact_flat_idx, phase2, corner_key=None):
    """One minibatch loss. ``raw``: (B, C); ``global_coords``: (B, 2) in [0,1];
    ``artifact_flat_idx``: (B,) position of each pixel within its view grid."""
    denoised = field.apply({"params": params["field"]}, global_coords,
                           corner_key)
    return _denoiser_losses(params["denoiser"], cfg, denoised, raw,
                            artifact_flat_idx, phase2, denoiser=denoiser)


def _scan_deferred(loop_key, params, opt_state, raw_flat, coords_flat,
                   cfg: Stage1Config, start, length: int):
    """``_scan_single`` with the hash-table Adam sweep deferred K steps.

    Per sub-step, only the small leaves (field MLP, artifact map, residual
    MLP) get their exact per-step fused Adam; the table's row gradients are
    kept as (index, value) pairs (gather happens outside the differentiated
    function via ops.hash_encoding.hash_plan/hash_gather_rows, so autodiff
    emits per-row cotangents instead of a dense scatter). Every K steps ONE
    batched scatter-add + ONE dense Adam sweep applies them, with
    lr * cfg.sweep_lr_scale (default K: Adam's step size is scale-invariant
    in the gradient, so one sweep integrating K accumulated steps moves the
    table ~K * lr). At K=1 this is numerically the standard fused path
    (equivalence-tested in tests/test_stage1.py).

    Motivation (PLAN.md round-2 profile): the dense sweep over the 77 MB
    table + moments is ~1/3 of the 3 ms step; deferring it amortizes all
    table-sized HBM passes by K while the row-count-bound gather/scatter
    (irreducible in XLA) and the small-leaf updates stay exact.
    """
    from dvt_tpu.ops.fused_adam import fused_adam_update, fused_adam_update_xla
    from dvt_tpu.ops.hash_encoding import (
        gather_rows,
        hash_encode_from,
        hash_gather_rows,
        hash_plan,
        scatter_add_rows,
        subsample_fine_levels,
    )

    K = cfg.table_sweep_every
    if length % K:
        raise ValueError(
            f"scan length {length} must be divisible by table_sweep_every={K}"
        )
    denoiser, field = cfg.modules()
    spec = field.spec
    hw = cfg.noise_map_height * cfg.noise_map_width
    pool = cfg.pool_size
    freeze_after = int(cfg.freeze_shared_artifacts_after * cfg.num_iters)
    coarse_n = spec.coarse_entries
    has_fine = coarse_n < spec.total_entries
    adam1 = (fused_adam_update
             if (cfg.optimizer_impl == "pallas"
                 and jax.default_backend() == "tpu")
             else fused_adam_update_xla)

    table0 = params["field"]["table"]
    split = lambda t: (
        {"denoiser": t["denoiser"],
         "field_mlp": {k: v for k, v in t["field"].items() if k != "table"}}
    )
    small0 = split(params)
    mu_t0, nu_t0 = opt_state["mu"]["field"]["table"], opt_state["nu"]["field"]["table"]
    mu_s0, nu_s0 = split(opt_state["mu"]), split(opt_state["nu"])

    def super_step(carry, super_i):
        table, mu_t, nu_t, small, mu_s, nu_s = carry
        coarse_prefix = jax.lax.slice_in_dim(table, 0, max(coarse_n, 1),
                                             axis=0)

        def sub_step(c2, k):
            small, mu_s, nu_s, acc_coarse = c2
            step = start + super_i * K + k
            phase2 = step > freeze_after
            skey = jax.random.fold_in(loop_key, step)
            idx = jax.random.randint(skey, (cfg.pixel_bsz,), 0, pool)
            # gather_rows: flat-lowering batched gather (vmap over images)
            raw = gather_rows(raw_flat, idx).astype(cfg.compute_dtype)
            coords = gather_rows(coords_flat, idx)
            art_idx = idx % hw
            corner_key = (jax.random.fold_in(skey, 1)
                          if cfg.stochastic_corners else None)

            plan = hash_plan(coords, spec, corner_key)
            if has_fine and cfg.level_sample:
                plan = subsample_fine_levels(
                    plan, jax.random.fold_in(skey, 2), cfg.level_sample
                )
            fine_rows = (hash_gather_rows(table, plan) if has_fine
                         else jnp.zeros((cfg.pixel_bsz, 0, 1, spec.n_features),
                                        table.dtype))

            def loss_fn(small_p, cp, fr):
                enc = hash_encode_from(
                    cp if coarse_n else cp[:0],
                    fr if has_fine else None,
                    plan, spec, batch_shape=(cfg.pixel_bsz,),
                )
                fp = {**small_p["field_mlp"], "table": table}
                denoised = field.apply(
                    {"params": fp}, enc, method="from_encoding"
                )
                return _denoiser_losses(small_p["denoiser"], cfg, denoised,
                                        raw, art_idx, phase2,
                                        denoiser=denoiser)

            (_, metrics), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2), has_aux=True
            )(small, coarse_prefix, fine_rows)
            g_small, g_coarse, g_fine = grads

            # torch-exact freeze: param AND moments untouched (G in phase
            # 2, residual predictor in phase 1 - _phase_frozen_mask)
            g_art = g_small["denoiser"]["shared_artifacts"]
            g_small["denoiser"]["shared_artifacts"] = jnp.where(
                phase2, 0.0, g_art)
            frozen = _phase_frozen_mask(small, phase2)
            small2, new_opt = fused_adam_apply(
                cfg, small, g_small,
                {"mu": mu_s, "nu": nu_s, "count": step}, step,
                frozen_mask=frozen,
            )
            acc_coarse = acc_coarse + g_coarse.astype(jnp.float32)
            return ((small2, new_opt["mu"], new_opt["nu"], acc_coarse),
                    (plan["fine_idx"] if has_fine else None, g_fine, metrics))

        acc0 = jnp.zeros((max(coarse_n, 1), spec.n_features), jnp.float32)
        (small, mu_s, nu_s, acc_coarse), (all_idx, all_g, m_steps) = (
            jax.lax.scan(sub_step, (small, mu_s, nu_s, acc0), jnp.arange(K))
        )

        g_table = jnp.zeros_like(table, dtype=jnp.float32)
        if coarse_n:
            g_table = g_table.at[:coarse_n].add(acc_coarse[:coarse_n])
        if has_fine:
            g_table = scatter_add_rows(
                g_table, all_idx.reshape(-1),
                all_g.reshape(-1, spec.n_features).astype(jnp.float32),
            )
        step_last = (start + super_i * K + K - 1).astype(jnp.float32)
        lr_t = lr_at(cfg, step_last) * cfg.sweep_lr_scale
        t_count = start // K + super_i + 1
        table, mu_t, nu_t = adam1(
            table, mu_t, nu_t, g_table, lr_t, t_count,
            b1=0.9, b2=0.99, eps=1e-15, wd=cfg.weight_decay,
        )
        return (table, mu_t, nu_t, small, mu_s, nu_s), m_steps

    carry0 = (table0, mu_t0, nu_t0, small0, mu_s0, nu_s0)
    (table, mu_t, nu_t, small, mu_s, nu_s), m_all = jax.lax.scan(
        super_step, carry0, jnp.arange(length // K)
    )

    def join(small_t, table_leaf):
        return {"denoiser": small_t["denoiser"],
                "field": {**small_t["field_mlp"], "table": table_leaf}}

    params = join(small, table)
    opt_state = {
        "mu": join(mu_s, mu_t),
        "nu": join(nu_s, nu_t),
        "count": opt_state["count"] + length,
    }
    step_metrics = jax.tree.map(
        lambda a: a.reshape(length, *a.shape[2:]), m_all
    )
    return params, opt_state, step_metrics


def _scan_single(loop_key, params, opt_state, raw_flat, coords_flat,
                 cfg: Stage1Config, start, length: int):
    """Run ``length`` fit steps from absolute step ``start``.

    The per-step PRNG is fold_in(loop_key, absolute_step), so splitting the
    25k-step loop across several dispatches (watchdog-friendly on tunneled
    dev chips) is bit-identical to one big scan.
    """
    if cfg.table_sweep_every > 1 or cfg.level_sample:
        if cfg.optimizer_impl not in ("fused", "pallas"):
            raise ValueError(
                "table_sweep_every > 1 / level_sample require "
                "optimizer_impl 'fused' or 'pallas'")
        return _scan_deferred(loop_key, params, opt_state, raw_flat,
                              coords_flat, cfg, start, length)
    from dvt_tpu.ops.hash_encoding import gather_rows

    denoiser, field = cfg.modules()
    hw = cfg.noise_map_height * cfg.noise_map_width
    pool = cfg.pool_size
    opt = make_optimizer(cfg)
    freeze_after = int(cfg.freeze_shared_artifacts_after * cfg.num_iters)

    def step_fn(carry, step):
        params, opt_state = carry
        # reference: step > freeze_after (strict) flips both switches (:70-72)
        phase2 = step > freeze_after
        skey = jax.random.fold_in(loop_key, step)
        idx = jax.random.randint(skey, (cfg.pixel_bsz,), 0, pool)
        # flat-lowering batched gather under vmap over images
        raw = gather_rows(raw_flat, idx).astype(cfg.compute_dtype)
        coords = gather_rows(coords_flat, idx)
        art_idx = idx % hw
        corner_key = (jax.random.fold_in(skey, 1)
                      if cfg.stochastic_corners else None)

        (loss, metrics), grads = jax.value_and_grad(
            _loss_fn, has_aux=True
        )(params, cfg, denoiser, field, raw, coords, art_idx, phase2,
          corner_key)

        # phase 2 freezes the shared artifact map (reference :70, :49-60)
        g_grad = grads["denoiser"]["shared_artifacts"]
        grads["denoiser"]["shared_artifacts"] = jnp.where(phase2, 0.0, g_grad)

        # torch-exact freeze in EVERY impl: param AND moments untouched
        # (G in phase 2, residual predictor h in phase 1 - see
        # _phase_frozen_mask)
        frozen = _phase_frozen_mask(params, phase2)
        if cfg.optimizer_impl in ("fused", "pallas"):
            params, opt_state = fused_adam_apply(
                cfg, params, grads, opt_state, step, frozen_mask=frozen)
        else:
            params, opt_state = _optax_apply_frozen(
                opt, params, grads, opt_state, frozen)
        return (params, opt_state), metrics

    steps = start + jnp.arange(length)
    (params, opt_state), step_metrics = jax.lax.scan(
        step_fn, (params, opt_state), steps
    )
    return params, opt_state, step_metrics


def _export_single(params, raw_features, cfg: Stage1Config):
    """Field on the full [0,1] grid (the stage-2 target) + recon quality.

    The reconstruction metric includes all three terms (F + G + h vs raw),
    matching the model the loss optimizes; F + G alone understates fit
    quality because h carries the image-dependent high-norm patterns.
    """
    denoiser, field = cfg.modules()
    h, w = cfg.grid_hw
    full_coords = make_patch_coordinates(h, w, 0.0, 1.0)
    denoised = field.apply({"params": params["field"]}, full_coords)
    denoised = denoised.astype(jnp.float32)
    raw_full = raw_features[-1].astype(jnp.float32)
    pred = (
        denoised.reshape(-1, cfg.feat_dim)
        + params["denoiser"]["shared_artifacts"]
        .reshape(-1, cfg.feat_dim)
        .astype(jnp.float32)
    )
    if cfg.enable_residual_predictor:
        res = denoiser.apply(
            {"params": params["denoiser"]},
            raw_full.reshape(-1, cfg.feat_dim).astype(cfg.compute_dtype),
            method=lambda m, x: m._residual(x),
        )
        pred = pred + res.astype(jnp.float32)
    final_cos = jnp.mean(
        cosine_similarity(pred, raw_full.reshape(-1, cfg.feat_dim))
    )
    return denoised, final_cos


def fit_one_image(
    key: Array,
    raw_features: Array,      # (V+1, h, w, C) - last slot is the full image
    pixel_coords: Array,      # (V+1, h, w, 2) in [0, 1]
    cfg: Stage1Config,
    return_params: bool = False,
) -> Tuple[Array, Dict[str, Array]]:
    """Run the full stage-1 fit for one image; vmap-able over a batch.

    Returns (denoised (h, w, C) fp32 - the field on the full grid - and a
    metrics dict of per-step losses plus final reconstruction quality).
    """
    pool = cfg.pool_size
    init_key, loop_key = jax.random.split(key)
    params, opt_state = init_fit(init_key, cfg)
    raw_flat = raw_features.reshape(pool, cfg.feat_dim)
    coords_flat = pixel_coords.reshape(pool, 2).astype(jnp.float32)

    params, opt_state, step_metrics = _scan_single(
        loop_key, params, opt_state, raw_flat, coords_flat, cfg,
        jnp.zeros((), jnp.int32), cfg.num_iters,
    )
    denoised, final_cos = _export_single(params, raw_features, cfg)
    metrics = {
        "loss_history": step_metrics["loss"],
        "final_loss": step_metrics["loss"][-1],
        "final_recon_cos": final_cos,
    }
    if return_params:
        return denoised, metrics, params
    return denoised, metrics


def decompose_full_image(params, cfg: Stage1Config, raw_features: Array,
                         pixel_coords: Array) -> Dict[str, Array]:
    """Visualization-path forward on a full grid: all decomposition terms
    (reference return_visualization=True, offline_denoiser.py:142-169)."""
    denoiser, field = cfg.modules()
    denoised = field.apply({"params": params["field"]},
                           pixel_coords.reshape(-1, 2))
    return denoiser.apply(
        {"params": params["denoiser"]},
        raw_features,
        denoised.reshape(raw_features.shape),
        None,
        phase2=True,
        return_visualization=True,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "return_params"))
def fit_image_batch(keys: Array, raw_features: Array, pixel_coords: Array,
                    cfg: Stage1Config, return_params: bool = False):
    """jit(vmap(fit)): fit a batch of images concurrently on one chip.

    keys: (N, 2) PRNG keys; raw_features: (N, V+1, h, w, C);
    pixel_coords: (N, V+1, h, w, 2).
    """
    return jax.vmap(
        lambda k, r, c: fit_one_image(k, r, c, cfg, return_params)
    )(keys, raw_features, pixel_coords)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _init_batch(keys, cfg: Stage1Config):
    def one(key):
        init_key, loop_key = jax.random.split(key)
        params, opt_state = init_fit(init_key, cfg)
        return params, opt_state, loop_key

    params, opt_state, loop_keys = jax.vmap(one)(keys)
    return {"params": params, "opt_state": opt_state, "loop_keys": loop_keys}


@functools.partial(jax.jit, static_argnames=("cfg", "length"),
                   donate_argnums=(0,))
def _chunk_batch(state, raw_features, pixel_coords, cfg: Stage1Config,
                 start, length: int):
    pool = cfg.pool_size

    def one(loop_key, params, opt_state, raw, coords):
        raw_flat = raw.reshape(pool, cfg.feat_dim)
        coords_flat = coords.reshape(pool, 2).astype(jnp.float32)
        params, opt_state, step_metrics = _scan_single(
            loop_key, params, opt_state, raw_flat, coords_flat, cfg,
            start, length,
        )
        return params, opt_state, step_metrics["loss"]

    params, opt_state, losses = jax.vmap(one)(
        state["loop_keys"], state["params"], state["opt_state"],
        raw_features, pixel_coords,
    )
    return (
        {"params": params, "opt_state": opt_state,
         "loop_keys": state["loop_keys"]},
        losses,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _export_batch(state, raw_features, cfg: Stage1Config):
    return jax.vmap(lambda p, r: _export_single(p, r, cfg))(
        state["params"], raw_features
    )


def fit_image_batch_chunked(keys, raw_features, pixel_coords,
                            cfg: Stage1Config, chunk_iters: int,
                            return_params: bool = False):
    """Identical numerics to fit_image_batch, split over several dispatches
    of <= chunk_iters steps each (needed where long-running single programs
    trip device watchdogs; also enables mid-fit progress reporting)."""
    state = _init_batch(keys, cfg)
    losses = []
    start = 0
    while start < cfg.num_iters:
        length = min(chunk_iters, cfg.num_iters - start)
        state, chunk_losses = _chunk_batch(
            state, raw_features, pixel_coords, cfg,
            jnp.asarray(start, jnp.int32), length,
        )
        losses.append(chunk_losses)
        start += length
    denoised, final_cos = _export_batch(state, raw_features, cfg)
    loss_history = jnp.concatenate(losses, axis=1)
    metrics = {
        "loss_history": loss_history,
        "final_loss": loss_history[:, -1],
        "final_recon_cos": final_cos,
    }
    if return_params:
        return denoised, metrics, state["params"]
    return denoised, metrics


def fit_image_batch_sharded(mesh, keys, raw_features, pixel_coords,
                            cfg: Stage1Config):
    """Shard the image batch over the mesh 'data' axis: each device fits its
    slice independently (the reference's per-GPU job sharding, done as SPMD)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = NamedSharding(mesh, P("data"))
    keys = jax.device_put(keys, batch_sharding)
    raw_features = jax.device_put(raw_features, batch_sharding)
    pixel_coords = jax.device_put(pixel_coords, batch_sharding)
    return fit_image_batch(keys, raw_features, pixel_coords, cfg)
