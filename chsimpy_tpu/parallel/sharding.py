"""Sharding placement helpers for solver state and constants."""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def grid_sharding(mesh: Mesh, axes=('x', 'y')) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_consts(consts: dict, mesh: Mesh) -> dict:
    """Place the (N, N) coefficient grids on the 2-D grid sharding and
    replicate the DCT matrix + scalars."""
    grid = grid_sharding(mesh)
    rep = replicated(mesh)
    out = {}
    for k, v in consts.items():
        if not hasattr(v, 'ndim'):
            out[k] = v  # non-array (e.g. the empty split-tree placeholder)
        elif v.ndim == 2 and k != 'C':
            out[k] = jax.device_put(v, grid)
        else:
            out[k] = jax.device_put(v, rep)
    return out


def shard_state(state, mesh: Mesh):
    """Place U/hat_U on the grid sharding, everything else replicated."""
    grid = grid_sharding(mesh)
    rep = replicated(mesh)
    return state.replace(
        U=jax.device_put(state.U, grid),
        hat_U=jax.device_put(state.hat_U, grid),
        rowbuf=jax.device_put(state.rowbuf, rep),
    )
