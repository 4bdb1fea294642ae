"""Same-session A/B: stage-1 fit-step cost vs images-per-batch.

The vmapped fit is row-count-bound (PLAN.md), so per-image step cost
should be ~flat in batch size, with gains only from amortizing the
~0.5 s/dispatch tunnel overhead and fixed per-step scalar work. This
measures ms/iter/IMAGE for N in {1, 2, 4} to pick bench.py's default
BENCH_IMAGES (and a user guidance number for main_img_denoising.py
--images_per_batch).

Usage: python tools/ab_batchsize.py [N ...]
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

from dvt_tpu.stage1 import Stage1Config, _chunk_batch, _init_batch

V, h, w, C = 768, 37, 37, 768
ITERS = 160
# the r3-validated bench defaults (12-level grid + 4-of-8 level dropout) -
# the config the "fits per chip" scaling claim must hold for
CFG = Stage1Config(optimizer_impl="fused", moments_dtype=jnp.bfloat16,
                   stochastic_corners=True, table_sweep_every=16,
                   n_levels=12, level_sample=4)

sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
k = jax.random.PRNGKey(0)
data, states = {}, {}
for n in sizes:
    raw = jax.random.normal(k, (n, V + 1, h, w, C), jnp.bfloat16)
    coords = jax.random.uniform(jax.random.fold_in(k, 1),
                                (n, V + 1, h, w, 2))
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    data[n] = (raw, coords)
    t0 = time.time()
    states[n] = _init_batch(keys, CFG)
    s, l = _chunk_batch(states[n], raw, coords, CFG,
                        jnp.asarray(0, jnp.int32), ITERS)
    np.asarray(l[0, -1])
    states[n] = s
    print(f"N={n}: compiled+warm in {time.time()-t0:.1f}s", flush=True)

times = {n: [] for n in sizes}
for rnd in range(3):
    for n in sizes:
        raw, coords = data[n]
        t0 = time.time()
        s, l = _chunk_batch(states[n], raw, coords, CFG,
                            jnp.asarray((rnd + 1) * ITERS, jnp.int32), ITERS)
        np.asarray(l[0, -1])
        dt = (time.time() - t0) / ITERS * 1e3
        states[n] = s
        times[n].append(dt)
        print(f"round{rnd} N={n}: {dt:.2f} ms/iter/batch = "
              f"{dt/n:.2f} ms/iter/image", flush=True)
for n in sizes:
    med = sorted(times[n])[1]
    print(f"MEDIAN N={n}: {med:.2f} ms/iter/batch = {med/n:.2f} "
          f"ms/iter/image", flush=True)
