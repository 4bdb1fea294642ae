import os, time, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax, jax.numpy as jnp, numpy as np
from dvt_tpu.stage1 import Stage1Config, _init_batch, _chunk_batch

N, V, h, w, C = 1, 768, 37, 37, 768
k = jax.random.PRNGKey(0)
raw = jax.random.normal(k, (N, V+1, h, w, C), jnp.bfloat16)
coords = jax.random.uniform(jax.random.fold_in(k, 1), (N, V+1, h, w, 2))
keys = jax.random.split(jax.random.PRNGKey(1), N)

ITERS = 160  # divisible by every table_sweep_every variant
S = dict(optimizer_impl="fused", moments_dtype=jnp.bfloat16, stochastic_corners=True)
variants = {
    "base_stoch": Stage1Config(**S),
    "pix512": Stage1Config(**S, pixel_bsz=512),
    "mom_f32": Stage1Config(optimizer_impl="fused", moments_dtype=jnp.float32,
                            stochastic_corners=True),
    "lev8": Stage1Config(**S, n_levels=8),
    "nores": Stage1Config(**S, enable_residual_predictor=False),
    "optax": Stage1Config(optimizer_impl="optax", moments_dtype=jnp.bfloat16),
    "fused": Stage1Config(optimizer_impl="fused", moments_dtype=jnp.bfloat16),
    "fused_stoch": Stage1Config(**S),
    "fused_stoch_thr12k": Stage1Config(**S) ,
    "sweep2": Stage1Config(**S, table_sweep_every=2),
    "sweep4": Stage1Config(**S, table_sweep_every=4),
    "sweep8": Stage1Config(**S, table_sweep_every=8),
    "sweep4_exact": Stage1Config(optimizer_impl="fused",
                                 moments_dtype=jnp.bfloat16,
                                 table_sweep_every=4),
    "sweep16": Stage1Config(**S, table_sweep_every=16),
    "sweep32": Stage1Config(**S, table_sweep_every=32),
    "sweep160": Stage1Config(**S, table_sweep_every=160),
}
sel = sys.argv[1:] or list(variants)
states = {}
for name in sel:
    cfg = variants[name]
    t0 = time.time()
    states[name] = _init_batch(keys, raw, coords, cfg)
    s, l = _chunk_batch(states[name], raw, coords, cfg, jnp.asarray(0, jnp.int32), ITERS)
    np.asarray(l[0, -1]); states[name] = s
    print(f"{name}: compiled+warm in {time.time()-t0:.1f}s", flush=True)

times = {n: [] for n in sel}
for rnd in range(3):
    for name in sel:
        cfg = variants[name]
        t0 = time.time()
        s, l = _chunk_batch(states[name], raw, coords, cfg,
                            jnp.asarray((rnd+1)*ITERS, jnp.int32), ITERS)
        np.asarray(l[0, -1])
        dt = (time.time() - t0) / ITERS * 1e3
        states[name] = s
        times[name].append(dt)
        print(f"round{rnd} {name}: {dt:.2f} ms/iter", flush=True)
for name in sel:
    print(f"MEDIAN {name}: {sorted(times[name])[1]:.2f} ms/iter", flush=True)
