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


def get_coefficients_axis(eaxis: jnp.ndarray, kappa_tilde, delt, delx2):
    """(CHeig, Seig) rebuilt per step from the 1-D eigenvalue axis.

    Identical formulas to :func:`get_coefficients`, but ``leig`` is
    broadcast from the (N,) axis inside the consumer's fused elementwise
    op instead of streamed from two precomputed (N, N) grids — on an
    HBM-bound step (PERFORMANCE.md round-5 roofline: the f32 N>=4096
    step moves ~1.3 GB against a 819 GB/s roof) this trades 2 full-field
    reads (134 MB at N=4096) for ~5 VPU flops/element (~0.02 ms).  The
    only numerical difference is the leig add's rounding: the stored
    grid is f64(e_i + e_j) cast to f32, this is f32(e_i) + f32(e_j) —
    <=1 ULP on leig, measured sub-noise on the E trace (the f32 route's
    own noise is ~3e-6; adoption evidence in PERFORMANCE.md round 5).
    Gated off in float64 validation mode, where bit-exactness rules."""
    lam1 = delt / delx2
    lam2 = kappa_tilde * lam1 / delx2
    leig = eaxis[:, None] + eaxis[None, :]
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
