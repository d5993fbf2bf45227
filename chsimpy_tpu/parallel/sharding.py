"""Sharding placement helpers for solver state and constants.

Two distributed-field layouts exist:

* **grid** — the field is tiled ``P('x', 'y')`` over the 2-D mesh; the
  matmul/ozaki transforms contract across it via GSPMD-partitioned dots
  (partial-shard all-gathers).  General, but wire-heavy: the audited
  volume at N=4096 f32 is ~168-252 MB/step/device (SCALING_PREDICTED).
* **pencil** — the field is sharded over ONE axis using *all* mesh
  devices (``P(None, ('x','y'))``: full columns per device), the
  spectral image over the other (``P(('x','y'), None)``: full rows).
  Each 1-D DCT stage then runs on a fully LOCAL axis (any route,
  including the folded split blocks) and the only transform
  communication is one transpose all-to-all per 2-D transform — the
  classic distributed-spectral pencil decomposition, 2 all-to-alls per
  solver step moving (D-1)/D of one field shard each.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def grid_sharding(mesh: Mesh, axes=('x', 'y')) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _flat_axes(mesh: Mesh) -> tuple:
    """The grid axis names present on this mesh, as one flattened group
    (('x', 'y') on a grid/ensemble mesh)."""
    return tuple(a for a in ('x', 'y') if a in mesh.axis_names)


def pencil_field_sharding(mesh: Mesh) -> NamedSharding:
    """Field (spatial) pencil layout: columns sharded over every grid
    device — axis 0 fully local (the column-stage transform axis)."""
    return NamedSharding(mesh, P(None, _flat_axes(mesh)))


def pencil_spec_sharding(mesh: Mesh) -> NamedSharding:
    """Spectral pencil layout: rows sharded — axis 1 fully local (the
    row-stage transform axis)."""
    return NamedSharding(mesh, P(_flat_axes(mesh), None))


def pencil_field_stack_sharding(mesh: Mesh) -> NamedSharding:
    """Field pencil layout of an [S, rows, cols] stack (the ozaki int8
    slice stacks): cols sharded, slot + row axes local."""
    return NamedSharding(mesh, P(None, None, _flat_axes(mesh)))


def pencil_spec_stack_sharding(mesh: Mesh) -> NamedSharding:
    """Spectral pencil layout of an [S, rows, cols] stack: rows
    sharded."""
    return NamedSharding(mesh, P(None, _flat_axes(mesh), None))


def shard_consts(consts: dict, mesh: Mesh, pencil: bool = False) -> dict:
    """Place the (N, N) coefficient grids on the field-appropriate
    sharding and replicate the DCT matrix / block tree / scalars.

    The coefficient grids live in SPECTRAL space ((hat_U + Seig·hat_E)
    / CHeig), so under the pencil layout they take the spectral (row)
    sharding."""
    spec = pencil_spec_sharding(mesh) if pencil else grid_sharding(mesh)
    rep = replicated(mesh)
    out = {}
    for k, v in consts.items():
        if k == 'tree':
            # nested tuple of split blocks: replicate every leaf
            out[k] = jax.tree_util.tree_map(
                lambda leaf: jax.device_put(leaf, rep), v)
        elif not hasattr(v, 'ndim'):
            out[k] = v
        elif v.ndim == 2 and k != 'C':
            out[k] = jax.device_put(v, spec)
        else:
            out[k] = jax.device_put(v, rep)
    return out


def shard_state(state, mesh: Mesh, pencil: bool = False):
    """Place U/hat_U on their layout shardings, everything else
    replicated.  Pencil: U column-sharded (field), hat_U row-sharded
    (spectral)."""
    if pencil:
        field = pencil_field_sharding(mesh)
        spec = pencil_spec_sharding(mesh)
    else:
        field = spec = grid_sharding(mesh)
    rep = replicated(mesh)
    return state.replace(
        U=jax.device_put(state.U, field),
        hat_U=jax.device_put(state.hat_U, spec),
        rowbuf=jax.device_put(state.rowbuf, rep),
    )
