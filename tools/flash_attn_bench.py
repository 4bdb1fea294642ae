"""Compiled flash-attention timing at the stride-4 video-demo sequence
length (~26k tokens) vs einsum SDPA.

The reference's stride-4 demo runs dense quadratic SDPA at up to ~26k
patch tokens (make_video_demo.py:21-27); this measures our Pallas kernel
(ops/flash_attention.py) against the einsum path, forward and
forward+backward, compiled on the TPU. SDPA at 26k tokens materializes a
(26k, 26k) score matrix per head (8.1 GB bf16 for 12 heads), so it may
OOM or thrash where flash runs in O(N*D) memory - that asymmetry is the
point of the kernel.

Usage: python tools/flash_attn_bench.py [seq_len ...]  (default 6724 26896)
Env: FA_HEADS (12), FA_DIM (64), FA_LOOPS (3).
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

from dvt_tpu.ops.flash_attention import flash_attention

HEADS = int(os.environ.get("FA_HEADS", "12"))
DIM = int(os.environ.get("FA_DIM", "64"))
LOOPS = int(os.environ.get("FA_LOOPS", "3"))


def sdpa(q, k, v):
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v)


def timed(fn, *args):
    """Time LOOPS iterations inside ONE jitted program (lax.fori_loop
    chaining the op through its q argument) so the ~0.5 s/dispatch tunnel
    overhead is amortized out, same methodology as kernel_probe.py."""

    @jax.jit
    def run(q, *rest):
        def body(i, q):
            out = fn(q, *rest)
            return jax.tree.leaves(out)[0].astype(q.dtype)
        return jax.lax.fori_loop(0, LOOPS, body, q)

    out = run(*args)  # compile + warm
    np.asarray(jax.device_get(out).ravel()[0])
    t0 = time.time()
    out = run(*args)
    np.asarray(jax.device_get(out).ravel()[0])
    return (time.time() - t0) / LOOPS


def main():
    # 6724 = 82^2 (stride-7 518px grid is 73^2=5329; 82^2 is the padded
    # vitdet 512px stride-4 /2 case); 26896 = 164^2, the stride-4 grid of
    # a 656px frame - the video-demo regime.
    seqs = [int(a) for a in sys.argv[1:]] or [6724, 26896]
    k0 = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}, heads={HEADS}, dim={DIM}")
    for n in seqs:
        q, k, v = (
            jax.random.normal(jax.random.fold_in(k0, i), (1, n, HEADS, DIM),
                              jnp.bfloat16)
            for i in range(3)
        )
        flops_fwd = 4 * n * n * HEADS * DIM  # QK^T + PV

        dt = timed(flash_attention, q, k, v)
        print(f"N={n} flash fwd: {dt*1e3:.1f} ms "
              f"({flops_fwd/dt/1e12:.2f} TFLOPs)")

        fl_g = jax.grad(
            lambda q, k, v: flash_attention(q, k, v).astype(jnp.float32).sum(),
            argnums=(0, 1, 2))
        dt = timed(fl_g, q, k, v)
        print(f"N={n} flash fwd+bwd: {dt*1e3:.1f} ms "
              f"({3.5*flops_fwd/dt/1e12:.2f} TFLOPs)")

        try:
            dt = timed(sdpa, q, k, v)
            print(f"N={n} sdpa  fwd: {dt*1e3:.1f} ms "
                  f"({flops_fwd/dt/1e12:.2f} TFLOPs)")
        except Exception as e:  # noqa: BLE001
            print(f"N={n} sdpa  fwd: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})")
        try:
            sd_g = jax.grad(
                lambda q, k, v: sdpa(q, k, v).astype(jnp.float32).sum(),
                argnums=(0, 1, 2))
            dt = timed(sd_g, q, k, v)
            print(f"N={n} sdpa  fwd+bwd: {dt*1e3:.1f} ms "
                  f"({3.5*flops_fwd/dt/1e12:.2f} TFLOPs)")
        except Exception as e:  # noqa: BLE001
            print(f"N={n} sdpa  fwd+bwd: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})")


if __name__ == "__main__":
    main()
