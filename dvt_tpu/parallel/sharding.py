"""Parameter sharding rules: data-parallel by default, optional tensor
parallelism for ViT params over the mesh's 'model' axis.

The reference only ever data-parallels (SURVEY.md 2.10) because its models
are <= 0.3B params; we keep DP the default but express TP as sharding
annotations so larger backbones (ViT-g at stride 4, ~26k tokens) scale over
ICI with XLA-inserted collectives - no code changes to the model:

  attn qkv / q/k/v kernels : shard output dim (head split)
  attn proj kernel         : shard input dim  (head split, row-parallel)
  mlp fc1/fc1_g/fc1_x      : shard output dim (column-parallel)
  mlp fc2 kernel           : shard input dim  (row-parallel)
  everything else          : replicated
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_names(path) -> list:
    return [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]


def vit_param_spec(path, leaf) -> P:
    names = _path_names(path)
    joined = "/".join(names)
    if leaf.ndim == 2:
        if any(s in joined for s in ("qkv/kernel", "q_proj/kernel",
                                     "k_proj/kernel", "v_proj/kernel",
                                     "fc1/kernel", "fc1_g/kernel",
                                     "fc1_x/kernel")):
            return P(None, "model")
        if any(s in joined for s in ("proj/kernel", "fc2/kernel")):
            return P("model", None)
    if leaf.ndim == 1 and any(
        s in joined
        for s in ("qkv/bias", "q_proj/bias", "v_proj/bias", "fc1/bias",
                  "fc1_g/bias", "fc1_x/bias")
    ):
        return P("model")
    return P()


def token_constraint(x, mesh, axis: str, dim: int):
    """Constrain ``dim`` of ``x`` to be sharded over ``axis``; every other
    dim is left UNCONSTRAINED so GSPMD composes this with whatever batch
    ("data") sharding is already in effect.

    This is the building block of sequence parallelism: annotating the
    token dimension makes XLA partition every per-token op (LN, MLP,
    projections) and insert the k/v all-gathers at attention — the
    activation-memory lever for small-stride distillation, where the
    attention score tensor is B*H*N^2 and N reaches 16k at stride 4
    (bench_stage23 r4: stride-4 training OOMs a single chip either way).
    """
    if mesh is None or axis is None:
        return x
    spec = [P.UNCONSTRAINED] * x.ndim
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def shard_params(mesh: Mesh, params: Any, tensor_parallel: bool = False) -> Any:
    """Place a param pytree on the mesh (replicated, or TP over 'model')."""

    def place(path, leaf):
        spec = vit_param_spec(path, leaf) if tensor_parallel else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(mesh: Mesh, params: Any, tensor_parallel: bool = False):
    """Matching pytree of NamedShardings (for jit in_shardings)."""

    def spec(path, leaf):
        s = vit_param_spec(path, leaf) if tensor_parallel else P()
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, params)
