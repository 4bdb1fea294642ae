"""Platform selection for the CLIs.

The axon TPU plugin ignores the ``JAX_PLATFORMS`` env var, so forcing a
backend requires ``jax.config.update("jax_platforms", ...)`` *before* the
first backend use (tests/conftest.py does the same for pytest). Every CLI
entry point calls :func:`apply_platform_env` so ``DVT_PLATFORM=cpu`` runs
any surface on host — e.g. driving the eval probes while the tunneled TPU
is wedged, or CI boxes with no accelerator.
"""

from __future__ import annotations

import os


def apply_platform_env(var: str = "DVT_PLATFORM") -> None:
    plat = os.environ.get(var)
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def normalize_input_geometry(args, zoo):
    """Shared CLI post-parse for --input_size/--auto_stride/--stride_size
    (all three training CLIs accept H or "H W", auto-stride to the model's
    patch size, and remap the 518 default to 512 for patch-16 backbones -
    reference main_*.py argument handling). Asserts divisibility so a bad
    stride fails at parse time, not with an opaque shape error mid-run."""
    if isinstance(args.input_size, int):
        args.input_size = (args.input_size, args.input_size)
    else:
        args.input_size = (tuple(args.input_size[:2])
                           if len(args.input_size) > 1
                           else (args.input_size[0], args.input_size[0]))
    if getattr(args, "auto_stride", False):
        args.stride_size = zoo.patch_size_of(args.model)
    if args.stride_size in (8, 16) and args.input_size[0] == 518:
        args.input_size = (512, 512)
    if args.input_size[0] % args.stride_size or \
            args.input_size[1] % args.stride_size:
        raise SystemExit(
            f"--input_size {args.input_size} must be divisible by "
            f"--stride_size {args.stride_size}")
    return args
