"""``np.gradient``-compatible finite-difference stencil.

The E2 surface-energy functional uses ``np.gradient(U, delx, axis=[0, 1],
edge_order=1)`` (``chsimpy/solver.py:97,213``): central differences in the
interior, one-sided at the two edges.  Implemented with static slices (XLA
fuses the whole thing into one elementwise pass) and with *division* by the
spacing — not multiplication by a reciprocal — to match NumPy's rounding.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gradient_axis0(U, delx):
    interior = (U[2:, :] - U[:-2, :]) / (2.0 * delx)
    first = (U[1:2, :] - U[0:1, :]) / delx
    last = (U[-1:, :] - U[-2:-1, :]) / delx
    return jnp.concatenate([first, interior, last], axis=0)


def gradient2d(U: jnp.ndarray, delx: float):
    """(dU/dx, dU/dy) with edge_order=1, matching
    ``np.gradient(U, delx, axis=[0, 1], edge_order=1)``."""
    dux = _gradient_axis0(U, delx)
    duy = _gradient_axis0(U.T, delx).T
    return dux, duy
