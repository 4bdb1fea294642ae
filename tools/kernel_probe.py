"""Microbenchmark of the primitives behind the stage-1 fit step.

Reproduces the measured numbers that PLAN.md's kernel-design decisions rest
on (gather/scatter cost per row, one-hot-matmul crossover, dense Adam sweep
variants, device calibration), so every claim can be re-checked in one run:

    python tools/kernel_probe.py            # all probes
    python tools/kernel_probe.py gather scatter adam onehot

Method: each probe is ONE jitted program that repeats the op LOOPS times in
a lax.fori_loop (the tunneled dev chip costs ~0.5 s per dispatch, so
per-dispatch timing would swamp everything), warmed once, then timed with a
host-side materialization (jax.block_until_ready is a no-op on the axon
backend - CLAUDE.md).

Reference context: the hash-table workload is 16 levels x 8 feats,
hashmap 2^20 (19.7M entries, 77 MB fp32), ~2048 pixels/step; with
stochastic corners the fit gathers+scatters ~20.5k rows/step
(tiny-cuda-nn config at /root/reference/dvt/models/neural_feature_field.py:25-39).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

LOOPS = int(os.environ.get("PROBE_LOOPS", "50"))
TABLE_ENTRIES = 2_461_148  # 16-level spec total ENTRIES (x8 feats = 19.7M params)
# entries rounded UP to the production padding quantum (hash_encoding
# padded_entries, quantum 256): 1<<21 was SMALLER than TABLE_ENTRIES and
# silently shrank the sweep workload ~15% vs the real 19.7M-param table
PAD = -(-TABLE_ENTRIES // 256) * 256
ROWS = 20_480  # ~rows touched per fit step with stochastic corners


def sync(x):
    # materialize ONE element: device_get of the whole leaf would drag a
    # 67-80 MB array through the tunnel inside the timed region
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timed(fn, *args):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    out = fn(*args)
    sync(out)
    return (time.time() - t0) / LOOPS


def probe_gather():
    k = jax.random.PRNGKey(0)
    table = jax.random.normal(k, (TABLE_ENTRIES, 8), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(k, 1), (ROWS,), 0,
                             TABLE_ENTRIES)

    @jax.jit
    def run(table, idx):
        def body(i, acc):
            rows = table[idx + (i % 7)]
            return acc + rows.sum()
        return jax.lax.fori_loop(0, LOOPS, body, jnp.zeros((), jnp.float32))

    dt = timed(run, table, idx)
    print(f"gather      {ROWS} rows x (8,) fp32 from {TABLE_ENTRIES} "
          f"entries: {dt*1e3:.2f} ms = {dt/ROWS*1e9:.1f} ns/row")


def probe_scatter():
    """Two scatter patterns with very different costs:

    * VJP-style (what the fit's backward does): scatter rows into a FRESH
      zeros gradient buffer — zeros init + row updates, fused by XLA.
    * loop-carried in-place update: XLA copies the whole table every
      iteration (measured ~copy-bound: 77 ms/iter on a 79 MB table at a
      1.3 GB/s session) — a trap for hand-rolled optimizer loops; the
      deferred-sweep design (stage1.py) avoids it by batching K steps of
      rows into ONE scatter + ONE dense sweep.
    """
    k = jax.random.PRNGKey(0)
    table = jax.random.normal(k, (TABLE_ENTRIES, 8), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(k, 1), (ROWS,), 0,
                             TABLE_ENTRIES)
    upd = jax.random.normal(jax.random.fold_in(k, 2), (ROWS, 8), jnp.float32)

    @jax.jit
    def run_vjp(idx, upd):
        def body(i, acc):
            g = jnp.zeros((TABLE_ENTRIES, 8), jnp.float32)
            g = g.at[idx + (i % 7)].add(upd)
            return acc + g[idx[0], 0]
        return jax.lax.fori_loop(0, LOOPS, body, jnp.zeros((), jnp.float32))

    dt = timed(run_vjp, idx, upd)
    print(f"scatter-add {ROWS} rows x (8,) fp32 into fresh zeros grad "
          f"({TABLE_ENTRIES} entries): {dt*1e3:.2f} ms = "
          f"{dt/ROWS*1e9:.1f} ns/row (incl. zeros init)")

    @jax.jit
    def run_carry(table, idx, upd):
        def body(i, t):
            return t.at[idx + (i % 7)].add(upd)
        return jax.lax.fori_loop(0, LOOPS, body, table)

    dt = timed(run_carry, table, idx, upd)
    print(f"scatter-add loop-carried in-place into the {TABLE_ENTRIES//1000}k-"
          f"entry table: {dt*1e3:.2f} ms (copy-bound trap, see docstring)")


def probe_onehot():
    """One-hot-matmul row gather (the MXU alternative for small levels):
    rows = onehot(idx, size) @ level. Crossover vs the 23 ns/row gather
    decides hash_encoding.py's one-hot threshold (default 4096)."""
    k = jax.random.PRNGKey(0)
    r = 2048  # rows per level per step
    for size in (1024, 4096, 12_321, 65_536):
        # the (r, size) one-hot intermediate reaches 256 MB at 64k
        # entries; scale the loop count down so each probe stays short
        loops = max(LOOPS * 4096 // size, 4)
        level = jax.random.normal(k, (size, 8), jnp.float32)
        idx = jax.random.randint(jax.random.fold_in(k, 1), (r,), 0, size)

        @jax.jit
        def run(level, idx, loops=loops):
            def body(i, acc):
                oh = jax.nn.one_hot(idx + (i % 3), level.shape[0],
                                    dtype=jnp.bfloat16)
                rows = oh @ level.astype(jnp.bfloat16)
                return acc + rows.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, loops, body,
                                     jnp.zeros((), jnp.float32))

        out = run(level, idx)
        sync(out)
        t0 = time.time()
        sync(run(level, idx))
        dt = (time.time() - t0) / loops
        print(f"one-hot mm  {r} rows from {size:>6}-entry level: "
              f"{dt*1e3:.3f} ms = {dt/r*1e9:.1f} ns/row")


def probe_adam():
    """Dense Adam sweep over the padded 77 MB table + bf16 moments.
    Three implementations: optax-style chain, single flat XLA expression
    (ops/fused_adam.fused_adam_update_xla), Pallas kernel."""
    from dvt_tpu.ops.fused_adam import fused_adam_update, fused_adam_update_xla

    k = jax.random.PRNGKey(0)
    p = jax.random.normal(k, (PAD // 16, 128), jnp.float32)
    m = jnp.zeros_like(p, jnp.bfloat16)
    v = jnp.zeros_like(p, jnp.bfloat16)
    g = jax.random.normal(jax.random.fold_in(k, 1), p.shape, jnp.float32)
    lr = jnp.float32(1e-2)

    import optax
    tx = optax.chain(optax.scale_by_adam(0.9, 0.99, 1e-15),
                     optax.add_decayed_weights(1e-5), optax.scale(-1e-2))
    opt_state = tx.init(p)

    @jax.jit
    def run_optax(p, opt_state, g):
        def body(i, carry):
            p, s = carry
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s
        return jax.lax.fori_loop(0, LOOPS, body, (p, opt_state))

    @jax.jit
    def run_xla(p, m, v, g):
        def body(i, carry):
            p, m, v = carry
            return fused_adam_update_xla(p, m, v, g, lr, i + 1,
                                         wd=1e-5)
        return jax.lax.fori_loop(0, LOOPS, body, (p, m, v))

    @jax.jit
    def run_pallas(p, m, v, g):
        def body(i, carry):
            p, m, v = carry
            return fused_adam_update(p, m, v, g, lr, i + 1, wd=1e-5)
        return jax.lax.fori_loop(0, LOOPS, body, (p, m, v))

    nbytes = p.nbytes + m.nbytes + v.nbytes + g.nbytes
    for name, fn, args in (
        ("optax chain", run_optax, (p, opt_state, g)),
        ("flat XLA   ", run_xla, (p, m, v, g)),
        ("pallas     ", run_pallas, (p, m, v, g)),
    ):
        try:
            dt = timed(fn, *args)
        except Exception as e:  # noqa: BLE001
            print(f"adam {name}: FAILED ({type(e).__name__})")
            continue
        print(f"adam {name} sweep over {p.size/1e6:.1f}M params: "
              f"{dt*1e3:.2f} ms = {nbytes*2/dt/1e9:.0f} GB/s effective")


def probe_calibration():
    k = jax.random.PRNGKey(0)
    big = jax.random.normal(k, (20_000_000,), jnp.float32)

    @jax.jit
    def sweep(x):
        return jax.lax.fori_loop(0, LOOPS, lambda i, x: x * 1.000001 + 0.5, x)

    dt = timed(sweep, big)
    print(f"HBM stream: {big.nbytes*2/dt/1e9:.1f} GB/s "
          f"(v5e spec 820)")

    a = jax.random.normal(k, (2048, 2048), jnp.bfloat16)

    @jax.jit
    def mm(x):
        return jax.lax.fori_loop(0, LOOPS, lambda i, x: (x @ x) * 0.01, x)

    dt = timed(mm, a)
    print(f"bf16 matmul: {2*2048**3/dt/1e12:.2f} TFLOPs (v5e spec 197)")


PROBES = {
    "calib": probe_calibration,
    "gather": probe_gather,
    "scatter": probe_scatter,
    "onehot": probe_onehot,
    "adam": probe_adam,
}


if __name__ == "__main__":
    sel = sys.argv[1:] or list(PROBES)
    print(f"device: {jax.devices()[0]}, loops/probe: {LOOPS}")
    for name in sel:
        PROBES[name]()
