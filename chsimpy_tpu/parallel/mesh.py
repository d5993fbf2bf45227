"""Device-mesh construction.

The reference's only parallelism is a same-host process pool over Monte-Carlo
runs (``chsimpy/experiment.py:197-216``).  Here the scaling axes are:

* a 2-D ``('x', 'y')`` grid mesh — the N x N concentration field is sharded
  ``P('x', 'y')``; the matmul-DCT contracts across it with XLA-inserted ICI
  collectives (the distributed-DCT transpose pattern);
* an ``('ens',)`` ensemble axis — vmapped UQ members sharded across
  hosts/chips (the reference's process pool, as one SPMD program).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_grid_mesh(shape: Sequence[int], devices=None) -> Mesh:
    """2-D ('x', 'y') mesh over the given devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    shape = tuple(shape)
    if len(shape) != 2:
        raise ValueError(f"grid mesh shape must be 2-D, got {shape}")
    n = shape[0] * shape[1]
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, "
                         f"have {len(devices)}")
    devs = np.asarray(devices[:n]).reshape(shape)
    return Mesh(devs, ('x', 'y'))


def make_ensemble_mesh(n_ens: int, grid_shape: Optional[Sequence[int]] = None,
                       devices=None) -> Mesh:
    """3-D ('ens', 'x', 'y') mesh: ensemble members data-parallel over 'ens'
    (DCN-friendly outermost axis), each member's grid sharded over
    ('x', 'y') (ICI)."""
    if devices is None:
        devices = jax.devices()
    if grid_shape is None:
        grid_shape = (1, 1)
    shape = (n_ens,) + tuple(grid_shape)
    n = math.prod(shape)
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, "
                         f"have {len(devices)}")
    devs = np.asarray(devices[:n]).reshape(shape)
    return Mesh(devs, ('ens', 'x', 'y'))


def best_grid_shape(n_devices: int) -> tuple:
    """Near-square 2-D factorization of n_devices (minimizes the
    all-to-all transpose volume of the distributed DCT)."""
    best = (1, n_devices)
    for a in range(1, int(math.isqrt(n_devices)) + 1):
        if n_devices % a == 0:
            best = (a, n_devices // a)
    return best
