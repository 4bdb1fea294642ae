"""Device-mesh construction and sharding helpers.

The reference's distributed story is NCCL DDP over 8 GPUs (dvt/utils/misc.py:
53-91). The TPU-native equivalent is a single ``jax.sharding.Mesh`` with a
``data`` axis (and an optional ``model`` axis for tensor-parallel shardings of
larger backbones); gradient and metric reductions become XLA collectives that
ride ICI, inserted automatically from sharding annotations - no hand-rolled
process groups or comm hooks.

Multi-host: call ``initialize_distributed()`` once per process; the mesh then
spans all global devices (DP over DCN across slices is expressed by the same
axis - XLA picks the transport).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (the TPU analogue of misc.init_distributed_mode).

    On TPU pods the arguments come from the environment, so bare
    ``jax.distributed.initialize()`` suffices; explicit args support GPU/CPU
    clusters. Safe to skip for single-process runs.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def safe_donate_argnums(*argnums: int):
    """Buffer donation, gated off on the experimental axon PJRT backend.

    Donating large train states into big fused programs triggers
    INVALID_ARGUMENT runtime faults on axon (observed with ViT-B stage-3
    steps); plain copies are correct everywhere, just use more HBM.
    Override with DVT_DONATE=1/0.
    """
    import os

    flag = os.environ.get("DVT_DONATE", "auto")
    if flag == "1":
        return tuple(argnums)
    if flag == "0":
        return ()
    try:
        version = getattr(jax.devices()[0].client, "platform_version", "")
    except Exception:
        version = ""
    return () if "axon" in version else tuple(argnums)


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``data=None`` consumes all remaining devices. model=1 collapses to pure
    data parallelism (the reference's only strategy; SURVEY.md 2.10).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading axis over 'data'; remaining axes replicated."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Pytree of host arrays -> batch-axis-sharded global arrays.

    Single-process: plain device_put with the data sharding. Multi-host:
    each process passes only its LOCAL rows (its sampler stripe) and the
    global array is assembled with make_array_from_process_local_data -
    a plain device_put of per-host-different data would silently keep
    only each host's addressable rows while violating its
    same-global-value contract."""
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                data_sharding(mesh, np.ndim(x)), np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), tree
    )


def local_rows(a, n: Optional[int] = None) -> np.ndarray:
    """First ``n`` process-LOCAL rows of a (possibly globally sharded)
    batch array. Eagerly slicing/np.asarray-ing a multi-host global array
    raises (non-addressable shards); visualization paths use this to
    render each process's own samples instead."""
    if isinstance(a, np.ndarray):
        return a[:n]
    if hasattr(a, "addressable_shards") and not getattr(
            a, "is_fully_addressable", True):
        parts = [np.asarray(s.data) for s in a.addressable_shards]
        return np.concatenate(parts)[:n]
    return np.asarray(a)[:n]
