"""On-device flash-attention equivalence check (COMPILED, not interpret).

tests/test_flash_attention.py validates the Pallas kernel in interpreter
mode on CPU; the compiled Mosaic kernel had only ever run on device inside
timing benches. This tool closes that loop: at an einsum-SDPA-compilable
length (default 6.7k tokens ~ stride-8 video geometry) it runs BOTH
implementations fwd + bwd on the TPU and reports max abs error on the
output and on all three input gradients.

Usage: python tools/flash_equiv_check.py  (env: FE_TOKENS, FE_DIM, FE_HEADS)
Writes a JSON line to stdout and appends to RESULTS-ready /tmp/flash_equiv.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    if os.environ.get("DVT_PLATFORM", "").lower() == "cpu":
        raise SystemExit(
            "flash_equiv_check needs the COMPILED Mosaic kernel - it "
            "cannot run on the CPU backend (interpret-mode coverage "
            "lives in tests/test_flash_attention.py)")
    from bench import wait_for_device

    if not wait_for_device(900):
        raise SystemExit("device not ready")
    import jax
    import jax.numpy as jnp

    from dvt_tpu.models.vit import sdpa
    from dvt_tpu.ops.flash_attention import flash_attention

    n = int(os.environ.get("FE_TOKENS", "6727"))  # 518/str-4-ish, odd on
    # purpose: exercises the kernel's tail-padding path in compiled mode
    h = int(os.environ.get("FE_HEADS", "12"))
    d = int(os.environ.get("FE_DIM", "64"))
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((1, n, h, d)), jnp.float32)
               for _ in range(3))
    cot = jnp.asarray(rng.standard_normal((1, n, h, d)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) * cot)

    def loss_sdpa(q, k, v):
        return jnp.sum(sdpa(q, k, v, precision="highest") * cot)

    fwd_flash = jax.jit(flash_attention)
    fwd_sdpa = jax.jit(lambda q, k, v: sdpa(q, k, v, precision="highest"))
    g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
    g_sdpa = jax.jit(jax.grad(loss_sdpa, argnums=(0, 1, 2)))

    o1 = np.asarray(fwd_flash(q, k, v))
    o2 = np.asarray(fwd_sdpa(q, k, v))
    gf = g_flash(q, k, v)
    gs = g_sdpa(q, k, v)
    scale = float(np.abs(o2).max())
    row = {
        "metric": "flash_attention_compiled_equivalence",
        "tokens": n, "heads": h, "head_dim": d,
        "device": str(jax.devices()[0]),
        "out_max_abs_err": float(np.abs(o1 - o2).max()),
        "out_scale": scale,
    }
    for name, a, b in (("dq", gf[0], gs[0]), ("dk", gf[1], gs[1]),
                       ("dv", gf[2], gs[2])):
        a, b = np.asarray(a), np.asarray(b)
        row[f"{name}_max_abs_err"] = float(np.abs(a - b).max())
        row[f"{name}_scale"] = float(np.abs(b).max())
    ok = row["out_max_abs_err"] < 2e-3 * max(scale, 1.0) and all(
        row[f"{g}_max_abs_err"] < 5e-3 * max(row[f"{g}_scale"], 1.0)
        for g in ("dq", "dk", "dv"))
    row["pass"] = bool(ok)
    print(json.dumps(row))
    with open("/tmp/flash_equiv.json", "a") as f:
        f.write(json.dumps(row) + "\n")
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
