"""Multiresolution hash-grid encoding (instant-ngp style) in pure XLA.

TPU-native replacement for the tiny-cuda-nn ``HashGrid`` encoding the
reference uses as its stage-1 hot kernel (dvt/models/neural_feature_field.py:
25-39): L levels of 2-D feature grids with geometrically increasing
resolution; fine levels are stored in a fixed-size hash table indexed by the
XOR-prime spatial hash of the cell corner; features at the four cell corners
are bilinearly blended and the per-level results concatenated.

Design notes (TPU-first):
  * The whole encoding is expressed as gathers from one flat
    ``(total_entries, F)`` table, so the backward pass is XLA's native
    scatter-add - no atomics needed - and the op ``vmap``s over a leading
    table axis, letting many independent per-image fields train on one chip.
  * Level geometry is static Python, so under ``jit`` every level's index
    arithmetic constant-folds; only the gathers remain.
  * Coarse levels additionally route through a one-hot interpolation-matrix
    matmul (MXU) so their backward is a transposed matmul rather than a
    row-count-bound scatter; the fused Pallas mega-kernel that replaces the
    remaining gather/scatter + optimizer sweeps is specced in PLAN.md.

Deviation from tcnn: we use the paper's ``pos = x * N_l`` vertex mapping with
corner clamping instead of tcnn's ``x * scale + 0.5`` offset; stage 1 trains
these tables from scratch, so only functional equivalence matters.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# tcnn's coherent prime hash for 2-D inputs: x * 1 XOR y * 2654435761.
_HASH_PRIME_Y = 2654435761


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static geometry of a multiresolution hash grid (2-D input)."""

    n_levels: int = 16
    n_features: int = 8
    log2_hashmap_size: int = 20
    base_resolution: int = 16
    max_resolution: int = 1024
    # Levels whose table fits under this many entries run as a one-hot
    # interpolation-matrix matmul instead of gathers: the backward pass is
    # then a transposed matmul on the MXU instead of a scatter-add, which is
    # row-count-bound on TPU (measured: ~27 ms of a 54 ms fit step is
    # gather/scatter rows). 0 disables the matmul path.
    matmul_level_threshold: int = 4096

    @property
    def per_level_scale(self) -> float:
        if self.n_levels == 1:
            return 1.0
        return math.exp(
            (math.log(self.max_resolution) - math.log(self.base_resolution))
            / (self.n_levels - 1)
        )

    @property
    def resolutions(self) -> Tuple[int, ...]:
        b = self.per_level_scale
        return tuple(
            int(math.floor(self.base_resolution * (b**l))) for l in range(self.n_levels)
        )

    @property
    def hashmap_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def level_sizes(self) -> Tuple[int, ...]:
        """Entries per level: dense (N+1)^2 when it fits, else the hash table size."""
        sizes = []
        for res in self.resolutions:
            dense = (res + 1) ** 2
            sizes.append(dense if dense <= self.hashmap_size else self.hashmap_size)
        return tuple(sizes)

    @property
    def level_offsets(self) -> Tuple[int, ...]:
        offs, acc = [], 0
        for s in self.level_sizes:
            offs.append(acc)
            acc += s
        return tuple(offs)

    @property
    def total_entries(self) -> int:
        return sum(self.level_sizes)

    @property
    def padded_entries(self) -> int:
        """Allocation row count: ``total_entries`` rounded up so the
        (rows, n_features) table reshapes copy-free to a 128-lane layout
        (rows * n_features divisible by 2048). Rows past ``total_entries``
        are never gathered or scattered, so their values never affect the
        encoding; they do get the same U(-1e-4, 1e-4) init as real rows
        and are touched by dense optimizer sweeps (weight decay slowly
        shrinks them) - do not rely on the padding tail being zero.
        Narrow-lane tables at full size crash the Mosaic pipeline on v5e,
        and 128-lane tiles are the natural sweep layout."""
        quantum = max(2048 // self.n_features, 1)
        return -(-self.total_entries // quantum) * quantum

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features

    @property
    def coarse_entries(self) -> int:
        """Rows taken by the matmul-path (coarse) levels. Level sizes are
        nondecreasing, so these levels are a contiguous table PREFIX - the
        deferred-sweep fit path (stage1.py) exploits this to treat
        ``table[:coarse_entries]`` as one dense-gradient block."""
        n = 0
        for s in self.level_sizes:
            if 0 < s <= self.matmul_level_threshold:
                n += s
        return n


def init_hash_table(
    key: jax.Array, spec: HashGridSpec, dtype=jnp.float32
) -> jax.Array:
    """tcnn-style init: U(-1e-4, 1e-4) over the flat table."""
    return jax.random.uniform(
        key, (spec.padded_entries, spec.n_features), dtype, minval=-1e-4,
        maxval=1e-4,
    )


def _level_indices_weights(coords, res: int, size: int):
    """Corner indices (within-level) and bilinear weights for one level.

    coords: (N, 2) in [0, 1].  Returns idx (N, 4) int32, w (N, 4) f32.
    """
    pos = coords * res  # vertices live at 0..res
    p0 = jnp.floor(pos)
    frac = pos - p0
    p0 = p0.astype(jnp.int32)

    # 4 corners; clamp keeps x=1.0 exact (clamped corner gets zero weight).
    cx = jnp.stack([p0[:, 0], p0[:, 0] + 1, p0[:, 0], p0[:, 0] + 1], axis=1)
    cy = jnp.stack([p0[:, 1], p0[:, 1], p0[:, 1] + 1, p0[:, 1] + 1], axis=1)
    cx = jnp.clip(cx, 0, res)
    cy = jnp.clip(cy, 0, res)

    wx = frac[:, 0:1]
    wy = frac[:, 1:2]
    w = jnp.concatenate(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], axis=1
    )

    dense = (res + 1) ** 2
    if dense <= size:
        idx = cy * (res + 1) + cx
    else:
        h = jnp.bitwise_xor(
            cx.astype(jnp.uint32),
            cy.astype(jnp.uint32) * jnp.uint32(_HASH_PRIME_Y),
        )
        # hashed levels always have power-of-two size
        idx = jnp.bitwise_and(h, jnp.uint32(size - 1)).astype(jnp.int32)
    return idx, w


def _coarse_matmul(idx, w, level_tab, base, size, dtype):
    """One-hot interpolation matmul for one coarse level: S[n, j] =
    sum_c w_c [idx_c == base + j], then S @ level_tab (VJP = S^T g - a
    transposed MXU matmul instead of a scatter).

    SHARED by hash_encode (base=0, level-local indices) and
    hash_encode_from (base=level offset, table-global indices) so the
    two paths cannot drift - the deferred-sweep fit depends on them
    composing to exactly the same encoding.

    Precision pinned: the TPU default truncates each matmul pass to bf16
    (~1e-3 rel), which would break the documented matmul-path ==
    gather-path equivalence ON DEVICE (the CPU test is exact either way).
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    sel = (idx[:, :, None] == (iota + base)).astype(dtype)
    smat = jnp.einsum("nc,ncj->nj", w.astype(dtype), sel,
                      precision="highest")
    return jnp.matmul(smat, level_tab, precision="highest")


def _stochastic_corner(corner_key, idx, w):
    """Draw ONE corner per (point, level) with bilinear-weight probability
    (first corner whose CDF exceeds u). Returns (N, Lg, 1) indices.

    SHARED by hash_encode and hash_plan - the draw must be bit-identical
    between the standard and deferred paths."""
    u = jax.random.uniform(corner_key, idx.shape[:2])
    cdf = jnp.cumsum(w, axis=-1)
    sel = jnp.sum(
        (u[..., None] > jax.lax.stop_gradient(cdf)).astype(jnp.int32),
        axis=-1,
    )
    sel = jnp.minimum(sel, 3)
    return jnp.take_along_axis(idx, sel[..., None], axis=-1)


@partial(jax.jit, static_argnames=("spec",))
def hash_encode(table: jax.Array, coords: jax.Array, spec: HashGridSpec,
                corner_key: jax.Array | None = None) -> jax.Array:
    """Encode coordinates through the multiresolution hash grid.

    Args:
      table: (spec.total_entries, spec.n_features) parameter table.
      coords: (..., 2) coordinates in [0, 1].
      spec: static grid geometry.
      corner_key: optional PRNG key enabling *stochastic corner sampling*
        for the gather-path (fine) levels: instead of blending all 4 cell
        corners, ONE corner is drawn per (point, level) with probability
        equal to its bilinear weight. The estimate is unbiased
        (E[T[c]] = sum_c w_c T[c]) and cuts the row-count-bound
        gather/scatter traffic 4x -- the dominant stage-1 cost on TPU,
        where XLA scatters are ~row-bound (PLAN.md). Training-only; pass
        None (exact blending) for evaluation/export.

    Returns:
      (..., n_levels * n_features) encoded features, in table dtype.
    """
    batch_shape = coords.shape[:-1]
    flat = coords.reshape(-1, 2).astype(jnp.float32)
    n = flat.shape[0]

    outs = []
    gather_idx, gather_w, gather_slots = [], [], []
    for l, (res, size, off) in enumerate(
        zip(spec.resolutions, spec.level_sizes, spec.level_offsets)
    ):
        idx, w = _level_indices_weights(flat, res, size)
        if 0 < size <= spec.matmul_level_threshold:
            level_tab = jax.lax.dynamic_slice_in_dim(table, off, size, axis=0)
            outs.append((l, _coarse_matmul(idx, w, level_tab, 0, size,
                                           table.dtype)))
        else:
            gather_idx.append(idx + off)
            gather_w.append(w)
            gather_slots.append(l)

    if gather_idx:
        idx = jnp.stack(gather_idx, axis=1)  # (N, Lg, 4)
        w = jnp.stack(gather_w, axis=1)
        if corner_key is not None:
            one_idx = _stochastic_corner(corner_key, idx, w)
            g_out = jnp.take(table, one_idx[..., 0], axis=0)  # (N, Lg, F)
        else:
            feats = jnp.take(table, idx, axis=0)  # (N, Lg, 4, F)
            g_out = jnp.sum(feats * w[..., None].astype(table.dtype), axis=2)
        for k, l in enumerate(gather_slots):
            outs.append((l, g_out[:, k]))

    outs.sort(key=lambda t: t[0])
    out = jnp.stack([o for _, o in outs], axis=1)  # (N, L, F)
    return out.reshape(*batch_shape, spec.n_output_dims)


# ---------------------------------------------------------------------------
# Split encode: plan -> gather -> apply.
#
# The stage-1 deferred-sweep optimizer (stage1.py, table_sweep_every > 1)
# needs the table access factored OUT of the differentiable computation so
# the table gradient exists as sparse (row index, row value) pairs instead of
# a dense scatter per step: K steps of row gradients are collected, then ONE
# dense scatter + ONE fused-Adam sweep runs per K steps, amortizing the
# table-sized HBM passes (the sweep is ~1/3 of the measured step cost,
# PLAN.md). hash_plan/hash_gather_rows/hash_encode_from compose to exactly
# hash_encode (equivalence-tested, incl. bit-identical stochastic corner
# draws: both paths fold the same key into the same-shape uniform draw).
# ---------------------------------------------------------------------------


def hash_plan(coords: jax.Array, spec: HashGridSpec,
              corner_key: jax.Array | None = None) -> dict:
    """Index/weight plan for one batch of lookups; no table access.

    Returns a dict of arrays (a valid scan/vmap pytree):
      coarse_idx: (N, Lc, 4) within-prefix indices of the matmul levels
      coarse_w:   (N, Lc, 4) bilinear weights
      fine_idx:   (N, Lg, 4) absolute table rows of the gather levels,
                  or (N, Lg, 1) when ``corner_key`` samples one corner
      fine_w:     (N, Lg, 4) weights, or (N, Lg, 1) ones (stochastic)
    Lc/Lg and the per-level slot order are static properties of ``spec``.
    """
    flat = coords.reshape(-1, 2).astype(jnp.float32)
    coarse_idx, coarse_w, fine_idx, fine_w = [], [], [], []
    for res, size, off in zip(
        spec.resolutions, spec.level_sizes, spec.level_offsets
    ):
        idx, w = _level_indices_weights(flat, res, size)
        if 0 < size <= spec.matmul_level_threshold:
            coarse_idx.append(idx + off)  # prefix rows: off is within prefix
            coarse_w.append(w)
        else:
            fine_idx.append(idx + off)
            fine_w.append(w)

    plan = {}
    if coarse_idx:
        plan["coarse_idx"] = jnp.stack(coarse_idx, axis=1)
        plan["coarse_w"] = jnp.stack(coarse_w, axis=1)
    if fine_idx:
        idx = jnp.stack(fine_idx, axis=1)  # (N, Lg, 4)
        w = jnp.stack(fine_w, axis=1)
        if corner_key is not None:
            # identical draw to hash_encode's stochastic path (shared impl)
            idx = _stochastic_corner(corner_key, idx, w)  # (N, Lg, 1)
            w = jnp.ones_like(idx, dtype=w.dtype)
        plan["fine_idx"] = idx
        plan["fine_w"] = w
    return plan


def subsample_fine_levels(plan: dict, key: jax.Array, keep: int) -> dict:
    """Randomly keep ``keep`` of the Lg gather levels for this step.

    Level-dropout speed knob for the fit: the gather/scatter row count
    (the dominant stage-1 step cost, PLAN.md) scales with the number of
    gather levels, so sampling keep < Lg cuts it proportionally. The
    encoding zero-fills dropped level slots and scales kept ones by
    Lg/keep (standard inverted dropout), so the MLP sees an unbiased
    feature estimate in expectation; the full-grid export always uses
    every level. Returns a plan with subset fine arrays + ``fine_perm``
    consumed by ``hash_encode_from``.
    """
    lg = plan["fine_idx"].shape[1]
    perm = jax.random.permutation(key, lg)[:keep]
    out = dict(plan)
    out["fine_idx"] = jnp.take(plan["fine_idx"], perm, axis=1)
    out["fine_w"] = jnp.take(plan["fine_w"], perm, axis=1)
    out["fine_perm"] = perm
    return out


def _batch_row_offsets(n: int, entries: int, trailing_ndim: int):
    off = jnp.arange(n, dtype=jnp.int32) * entries
    return off.reshape((n,) + (1,) * trailing_ndim)


def _use_flat_vmap() -> bool:
    # Opt-in (DVT_FLAT_VMAP=1): the flat lowering is CPU-equivalence-tested
    # but its only device outing so far died at first materialization
    # (FAILED_PRECONDITION, logs/r5_device/ab_batchsize_flat.log) and the
    # default lowering's measured vmap penalty is just 6.5%/image at the
    # 1.69 ms/iter operating point with a default vmap width of 1
    # (RESULTS.md 9d) — so the three-rounds-device-proven default lowering
    # stays the default until the flat arm is measured healthy on device.
    # Read at trace time.
    import os

    return os.environ.get("DVT_FLAT_VMAP", "0") == "1"


@jax.custom_batching.custom_vmap
def _gather_rows_flat(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``jnp.take(table, idx, axis=0)`` with a flattening vmap rule.

    Under ``vmap`` (one table per image in the stage-1 fit), XLA's default
    batching gives the gather/scatter an operand batch dimension, which the
    TPU backend executes per-batch-element instead of as one flat row
    stream — the measured reason vmapped N=2/4 fits cost MORE per image
    than N=1 (PLAN.md round-2 finding 0b). The rule here reshapes the N
    ``(E, ...)`` tables to one ``(N*E, ...)`` table and offsets each
    image's indices by ``image * E``, so the lowering is identical to the
    unbatched fit's flat 1-D gather and per-image cost stays flat in N.

    Only for NON-differentiated uses (row gathers feeding
    ``hash_encode_from``, per-step data batch picks, gradient scatters):
    ``custom_vmap`` does not compose with autodiff.
    """
    return jnp.take(table, idx, axis=0)


@_gather_rows_flat.def_vmap
def _gather_rows_vmap(axis_size, in_batched, table, idx):
    t_b, i_b = in_batched
    if not t_b:  # shared table: already a flat gather over larger idx
        return jnp.take(table, idx, axis=0), bool(i_b)
    n, entries = table.shape[0], table.shape[1]
    flat = table.reshape((n * entries,) + table.shape[2:])
    if i_b:
        out = jnp.take(
            flat, idx + _batch_row_offsets(n, entries, idx.ndim - 1), axis=0
        )
    else:
        out = jnp.take(
            flat, idx[None] + _batch_row_offsets(n, entries, idx.ndim),
            axis=0,
        )
    return out, True


@jax.custom_batching.custom_vmap
def _scatter_add_rows_flat(acc: jax.Array, idx: jax.Array,
                           vals: jax.Array) -> jax.Array:
    """``acc.at[idx].add(vals)`` (idx 1-D) with a flattening vmap rule.

    Same trap/fix as :func:`gather_rows`, for the backward direction: the
    batched scatter-add of per-image row gradients into per-image tables
    runs as one flat scatter into the ``(N*E, ...)`` view. NON-
    differentiated uses only (it applies accumulated gradients).
    """
    return acc.at[idx].add(vals)


@_scatter_add_rows_flat.def_vmap
def _scatter_add_rows_vmap(axis_size, in_batched, acc, idx, vals):
    a_b, i_b, v_b = in_batched
    if not a_b:
        acc = jnp.broadcast_to(acc, (axis_size,) + acc.shape)
    n, entries = acc.shape[0], acc.shape[1]
    if not i_b:
        idx = jnp.broadcast_to(idx, (n,) + idx.shape)
    if not v_b:
        vals = jnp.broadcast_to(vals, (n,) + vals.shape)
    flat = acc.reshape((n * entries,) + acc.shape[2:])
    rows = (idx + _batch_row_offsets(n, entries, idx.ndim - 1)).reshape(-1)
    flat = flat.at[rows].add(vals.reshape((-1,) + vals.shape[2:]))
    return flat.reshape(acc.shape), True


def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Non-differentiated row gather; flat-lowering under vmap by default."""
    if _use_flat_vmap():
        return _gather_rows_flat(table, idx)
    return jnp.take(table, idx, axis=0)


def scatter_add_rows(acc: jax.Array, idx: jax.Array,
                     vals: jax.Array) -> jax.Array:
    """Non-differentiated row scatter-add; flat-lowering under vmap."""
    if _use_flat_vmap():
        return _scatter_add_rows_flat(acc, idx, vals)
    return acc.at[idx].add(vals)


def hash_gather_rows(table: jax.Array, plan: dict) -> jax.Array:
    """Gather the fine-level corner rows: (N, Lg, C, F), C in {1, 4}.

    Call OUTSIDE the differentiated function; pass the result into
    ``hash_encode_from`` as a differentiable argument, so d(loss)/d(rows)
    comes out of autodiff as dense row values ready for a batched
    scatter-add into the table gradient."""
    return gather_rows(table, plan["fine_idx"])


def _coarse_slots_fine_slots(spec: HashGridSpec):
    coarse, fine = [], []
    for l, size in enumerate(spec.level_sizes):
        (coarse if 0 < size <= spec.matmul_level_threshold else fine).append(l)
    return coarse, fine


def hash_encode_from(coarse_prefix: jax.Array, fine_rows: jax.Array | None,
                     plan: dict, spec: HashGridSpec,
                     batch_shape=()) -> jax.Array:
    """Encoding from pre-gathered pieces; differentiable in both table args.

    coarse_prefix: (spec.coarse_entries, F) - the dense prefix of the table
      (matmul levels). Its VJP is a dense (coarse_entries, F) gradient.
    fine_rows: (N, Lg, C, F) from ``hash_gather_rows`` (or None when every
      level is a matmul level). Its VJP is per-row gradients aligned with
      plan["fine_idx"].
    """
    outs = []
    coarse_slots, fine_slots = _coarse_slots_fine_slots(spec)
    if coarse_slots:
        idx, w = plan["coarse_idx"], plan["coarse_w"]
        dtype = coarse_prefix.dtype
        # per-level one-hot matmuls, shared impl with hash_encode
        # (indices here are table-global, hence base=off)
        for k, l in enumerate(coarse_slots):
            size = spec.level_sizes[l]
            off = spec.level_offsets[l]
            level_tab = jax.lax.dynamic_slice_in_dim(
                coarse_prefix, off, size, axis=0
            )
            outs.append((l, _coarse_matmul(idx[:, k], w[:, k], level_tab,
                                           off, size, dtype)))
    if fine_slots:
        w = plan["fine_w"][..., None].astype(fine_rows.dtype)
        fine_out = jnp.sum(fine_rows * w, axis=2)  # (N, keep_or_Lg, F)
        if "fine_perm" in plan:
            # level dropout (subsample_fine_levels): scatter the sampled
            # levels back to their slots, zero the rest, inverted-dropout
            # scale so the expectation matches the full encoding
            lg = len(fine_slots)
            keep = fine_out.shape[1]
            full = jnp.zeros(
                (fine_out.shape[0], lg, fine_out.shape[2]), fine_out.dtype
            )
            fine_out = full.at[:, plan["fine_perm"]].set(
                fine_out * (lg / keep)
            )
        for k, l in enumerate(fine_slots):
            outs.append((l, fine_out[:, k]))
    outs.sort(key=lambda t: t[0])
    out = jnp.stack([o for _, o in outs], axis=1)
    return out.reshape(*batch_shape, spec.n_output_dims)
