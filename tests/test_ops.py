"""Numerical building blocks vs their NumPy/SciPy counterparts."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fftpack as scifft

from chsimpy_tpu.ops import coeffs, dct, stencil


@pytest.mark.parametrize('N', [8, 64, 129])
def test_dct2_matches_scipy(N):
    rng = np.random.default_rng(0)
    U = rng.random((N, N))
    C = dct.dct_matrix(N)
    ours = np.asarray(dct.dct2(jnp.asarray(U), C))
    ref = scifft.dctn(U, norm='ortho')
    assert np.allclose(ours, ref, rtol=0, atol=1e-12)


@pytest.mark.parametrize('N', [8, 64])
def test_idct2_matches_scipy(N):
    rng = np.random.default_rng(1)
    X = rng.random((N, N))
    C = dct.dct_matrix(N)
    ours = np.asarray(dct.idct2(jnp.asarray(X), C))
    ref = scifft.idctn(X, norm='ortho')
    assert np.allclose(ours, ref, rtol=0, atol=1e-12)


def test_dct_roundtrip_identity():
    rng = np.random.default_rng(2)
    U = rng.random((64, 64))
    C = dct.dct_matrix(64)
    back = np.asarray(dct.idct2(dct.dct2(jnp.asarray(U), C), C))
    assert np.allclose(back, U, rtol=0, atol=1e-13)


def test_eigenvalues_match_reference_convention():
    # reference eigenvalue grid (chsimpy/utils.py:34-36): outer sum of
    # 2cos(pi*k/(N-1)) - 2 — the (N-1) convention, reproduced verbatim
    N = 16
    e = (2 * np.cos(np.pi * np.arange(N) / (N - 1)) - 2)
    expected = e[:, None] * np.ones((1, N)) + np.ones((N, 1)) * e[None, :]
    ours = np.asarray(coeffs.eigenvalues(N))
    assert np.array_equal(ours, expected)


def test_coefficients_match_reference_formula():
    N, kt, delt, delx2 = 16, 3e-4, 3e-8, 1.5e-5
    leig = coeffs.eigenvalues(N)
    CHeig, Seig = coeffs.get_coefficients(leig, kt, delt, delx2)
    lam1 = delt / delx2
    lam2 = kt * lam1 / delx2
    lnp = np.asarray(leig)
    assert np.allclose(np.asarray(CHeig), 1 + lam2 * lnp * lnp, rtol=1e-15)
    assert np.allclose(np.asarray(Seig), lam1 * lnp, rtol=1e-15)


@pytest.mark.parametrize('N', [5, 32, 63])
def test_gradient_matches_numpy(N):
    rng = np.random.default_rng(3)
    U = rng.random((N, N))
    delx = 2.0 / (N - 1)
    gx, gy = stencil.gradient2d(jnp.asarray(U), delx)
    rx, ry = np.gradient(U, delx, axis=[0, 1], edge_order=1)
    assert np.array_equal(np.asarray(gx), rx)
    assert np.array_equal(np.asarray(gy), ry)
