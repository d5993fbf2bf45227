"""Spectral coefficient grids for the semi-implicit DCT update.

The DCT diagonalizes the Laplacian under no-flux BCs; the reference encodes
its eigenvalues with the (N-1) convention ``2*cos(pi*k/(N-1)) - 2``
(``chsimpy/utils.py:34-36`` — MATLAB heritage; reproduced verbatim, exactness
beats orthodoxy) and builds

    CHeig = 1 + lam2 * leig^2      (implicit biharmonic denominator)
    Seig  = lam1 * leig            (explicit Laplacian of the nonlinear term)

with lam1 = delt/delx^2, lam2 = kappa_tilde*lam1/delx^2
(``chsimpy/utils.py:39-49``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def eigenvalue_axis(N: int) -> np.ndarray:
    """1-D eigenvalue vector 2*cos(pi*k/(N-1)) - 2, k = 0..N-1 (float64)."""
    k = np.arange(N, dtype=np.float64)
    return 2.0 * np.cos(np.pi * k / (N - 1)) - 2.0


def eigenvalues(N: int, dtype=jnp.float64) -> jnp.ndarray:
    """(N, N) grid: leig[i, j] = e[i] + e[j]."""
    e = eigenvalue_axis(N)
    leig = e[:, None] + e[None, :]
    return jnp.asarray(leig, dtype=dtype)


def get_coefficients(leig: jnp.ndarray, kappa_tilde, delt, delx2):
    """(CHeig, Seig) from the precomputed eigenvalue grid.

    Written so the adaptive-time path (``chsimpy/solver.py:183-193``) can
    rebuild the grids on device from ``leig`` with two fused elementwise ops.
    """
    lam1 = delt / delx2
    lam2 = kappa_tilde * lam1 / delx2
    CHeig = 1.0 + lam2 * (leig * leig)
    Seig = lam1 * leig
    return CHeig, Seig


def get_coefficients_np(N: int, kappa_tilde: float, delt: float,
                        delx2: float):
    """Host-side (CHeig, Seig) in the natural coefficient order — the
    user-facing form (Solution export), independent of the engine's
    internal transform basis."""
    e = eigenvalue_axis(N)
    leig = e[:, None] + e[None, :]
    lam1 = delt / delx2
    lam2 = kappa_tilde * lam1 / delx2
    return 1.0 + lam2 * (leig * leig), lam1 * leig
