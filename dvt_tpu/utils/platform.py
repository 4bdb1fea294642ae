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
