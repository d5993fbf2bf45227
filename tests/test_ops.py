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


@pytest.mark.parametrize('route', ['matmul', 'split'])
def test_adaptive_rebuild_matches_oracle_at_golden_delts(route):
    """The ON-DEVICE CHeig/Seig rebuild (the adaptive-time path runs it
    every step, core/stepper.py _step) must reproduce the independent
    numpy oracle at every delt value the chaotic adaptive golden actually
    visited — in both the natural (matmul-route) and permuted
    (split-route) spectral bases.  This pins the rebuild arithmetic
    directly, independent of trajectory chaos (the 600-step adaptive
    trace itself diverges from ~step 500, so its tolerance is loose)."""
    import json
    import os

    import jax

    from oracle import coeff_grids
    from chsimpy_tpu.core import stepper as stepper_mod
    from chsimpy_tpu.ops import dct as dct_ops

    with open(os.path.join(os.path.dirname(__file__), 'golden',
                           'n64_adaptive_600.json')) as f:
        g = json.load(f)
    delts = sorted(set(g['delt']))
    assert len(delts) > 10  # the golden really adapted

    import chsimpy_tpu as ct
    p = ct.Parameters()
    p.N = 64
    p.no_gui = True
    p.adaptive_time = True
    p.transform_backend = route
    p.kappa_tilde = 2.98911291966116e-4
    from chsimpy_tpu.core.solver import Solver
    s = Solver(p)
    s.prepare()
    cfg, consts = s.cfg, s._consts

    from chsimpy_tpu.ops import coeffs as coeffs_ops
    rebuild = jax.jit(lambda d: coeffs_ops.get_coefficients(
        consts['leig'], consts['kappa_tilde'], d, cfg.delx2))

    for delt in delts:
        CH_d, S_d = rebuild(jnp.asarray(delt, jnp.float64))
        CH_o, S_o = coeff_grids(64, p.kappa_tilde, delt, cfg.delx2)
        if route == 'split':
            lv = cfg.split_levels_resolved
            CH_o = dct_ops.split_permute_grid(CH_o, 64, lv)
            S_o = dct_ops.split_permute_grid(S_o, 64, lv)
        np.testing.assert_allclose(np.asarray(CH_d), CH_o, rtol=1e-14)
        np.testing.assert_allclose(np.asarray(S_d), S_o, rtol=1e-14)


def test_idct2_banded_equals_idct2_at_equal_precision():
    """The banded inverse is EXACTLY idct2 when both bands run the same
    precision (the split is algebraic: C^T X C block-partitioned over
    the contraction index) — here at f64 where precision tiers are
    no-ops, to 1-ULP reassembly order."""
    import numpy as np
    from chsimpy_tpu.ops.dct import dct2, idct2, idct2_banded, dct_matrix

    rng = np.random.default_rng(7)
    N = 64
    U = jnp.asarray(rng.random((N, N)))
    C = dct_matrix(N)
    X = dct2(U, C)
    full = np.asarray(idct2(X, C))
    for k0 in (8, 16, 32):
        band = np.asarray(idct2_banded(X, C, k0))
        np.testing.assert_allclose(band, full, rtol=0, atol=1e-14)
        np.testing.assert_allclose(band, np.asarray(U), rtol=0, atol=1e-12)
