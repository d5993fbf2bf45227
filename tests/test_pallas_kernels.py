"""Pallas kernels vs the XLA reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fftpack as scifft

import chsimpy_tpu as ct
from chsimpy_tpu.ops import dct as dct_ops
from chsimpy_tpu.ops import pallas_kernels as pk


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pk._INTERPRET
    pk._INTERPRET = True
    yield
    pk._INTERPRET = old


def test_chemical_potential_matches_xla():
    rng = np.random.default_rng(0)
    U = (0.875 + 0.01 * (rng.random((64, 64)) - 0.5)).astype(np.float32)
    RT, BRT, A0, A1 = 7.676, 98.7, -151.26, -85.61
    ours = np.asarray(pk.chemical_potential(jnp.asarray(U), RT, BRT, A0, A1))
    Uinv = 1 - U
    ref = (RT * np.log(U / Uinv) - BRT
           + (A0 + A1 * (Uinv - U)) * (Uinv - U) - 2 * A1 * U * Uinv)
    # the chain cancels ~1e2-magnitude terms down to ~0.3, so f32 op-order
    # differences show up at ~100*eps absolute
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_spectral_update_matches_formula():
    rng = np.random.default_rng(1)
    h = rng.random((64, 64)).astype(np.float32)
    e = rng.random((64, 64)).astype(np.float32)
    s = rng.random((64, 64)).astype(np.float32)
    c = (1 + rng.random((64, 64))).astype(np.float32)
    out = np.asarray(pk.spectral_update(*map(jnp.asarray, (h, e, s, c))))
    np.testing.assert_allclose(out, (h + s * e) / c, rtol=1e-6)


@pytest.mark.parametrize('shape', [(64, 64), (128, 256)])
def test_matmul_matches_numpy(shape):
    rng = np.random.default_rng(2)
    A = rng.random(shape).astype(np.float32)
    B = rng.random((shape[1], 96)).astype(np.float32)
    out = np.asarray(pk.matmul(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(out, A @ B, rtol=1e-5)


def test_dct2_pallas_matches_scipy():
    rng = np.random.default_rng(3)
    U = rng.random((64, 64)).astype(np.float32)
    C = dct_ops.dct_matrix(64, jnp.float32)
    ours = np.asarray(pk.dct2_pallas(jnp.asarray(U), C))
    ref = scifft.dctn(U.astype(np.float64), norm='ortho')
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-4)



def test_pallas_mesh_needs_divisible_N():
    p = ct.Parameters()
    p.N = 40   # 40 % (2*8) != 0 — bands would not tile the x-shards
    p.kernel_backend = 'pallas'
    p.mesh_shape = (2, 4)
    with pytest.raises(ValueError, match='divisible'):
        ct.Solver(p)


def _run_sharded(mesh_shape, precision):
    p = ct.Parameters()
    p.N = 64
    p.ntmax = 25
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.precision = precision
    p.kernel_backend = 'pallas'
    p.kappa_tilde = 2.98911291966116e-4
    p.mesh_shape = mesh_shape
    return ct.Simulator(p).solve()


@pytest.mark.parametrize('mesh_shape', [(2, 4), (2, 2)])
def test_pallas_sharded_matches_unsharded_f64(mesh_shape):
    """`--kernels pallas --mesh`: per-shard banded kernels under
    shard_map + halo exchange must reproduce the single-device Pallas
    trajectory (f64: only summation order differs)."""
    ref = _run_sharded(None, 'float64')
    sh = _run_sharded(mesh_shape, 'float64')
    assert sh.computed_steps == ref.computed_steps
    np.testing.assert_allclose(sh.U, ref.U, rtol=0, atol=1e-12)
    np.testing.assert_allclose(sh.timedata.E, ref.timedata.E, rtol=1e-12)
    td_ref = ref.timedata.data()
    td_sh = sh.timedata.data()
    np.testing.assert_allclose(td_sh[:, 2], td_ref[:, 2], rtol=1e-10)  # E2
    np.testing.assert_allclose(td_sh[:, 3], td_ref[:, 3], atol=0)      # SA


def test_pallas_sharded_matches_xla_sharded_f32():
    """The sharded Pallas path against the sharded XLA path (f32)."""
    sh = _run_sharded((2, 4), 'float32')

    p = ct.Parameters()
    p.N = 64
    p.ntmax = 25
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.precision = 'float32'
    p.kappa_tilde = 2.98911291966116e-4
    p.mesh_shape = (2, 4)
    ref = ct.Simulator(p).solve()
    assert sh.computed_steps == ref.computed_steps
    np.testing.assert_allclose(sh.U, ref.U, rtol=0, atol=1e-5)
    np.testing.assert_allclose(sh.timedata.E, ref.timedata.E, rtol=1e-6)


def test_fused_stats_matches_xla_stats():
    """The banded fused-stats kernel must reproduce the XLA _stats chain
    (E, E2, PS, L2, Ra, SA) including the np.gradient edge stencil."""
    from chsimpy_tpu.core.stepper import StepConfig, _stats, make_consts
    from chsimpy_tpu.derived import Derived
    rng = np.random.default_rng(3)
    N = 64
    p = ct.Parameters()
    p.N = N
    p.kappa_tilde = 2.98911291966116e-4
    d = Derived.from_params(p)
    cfg = StepConfig(N=N, dtype='float64', RT=d.RT, BRT=d.BRT, B=p.B,
                     Amr=d.Amr, L=p.L, delx=d.delx, delx2=d.delx2,
                     M_tilde=p.M_tilde, threshold=p.threshold,
                     A0=d.A0, A1=d.A1, kappa_tilde=d.kappa_tilde)
    consts = make_consts(cfg, p.delt)
    U = jnp.asarray(0.875 + 0.01 * (rng.random((N, N)) - 0.5))
    Eut = jnp.asarray(rng.random((N, N)) - 0.5)
    ref = _stats(cfg, consts, U, Eut)
    got = pk.fused_stats(U, Eut, consts['A0'], consts['A1'],
                         consts['kappa_tilde'], delx=cfg.delx, RT=cfg.RT,
                         B=cfg.B, Amr=cfg.Amr, L=cfg.L,
                         threshold=cfg.threshold)
    names = ('E', 'E2', 'PS', 'L2', 'Ra', 'SA')
    for n, r, g in zip(names, ref, got):
        np.testing.assert_allclose(float(g), float(r), rtol=1e-12,
                                   err_msg=n)


def test_solver_pallas_backend_matches_xla():
    """Full solve with kernel_backend='pallas' (fused mu + DCT matmuls +
    fused stats, interpret mode) vs the XLA path."""
    def run(backend):
        p = ct.Parameters()
        p.N = 32
        p.ntmax = 25
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.precision = 'float32'
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.kernel_backend = backend
        sol = ct.Simulator(p).solve()
        return np.asarray(sol.timedata.data()), np.asarray(sol.U)

    tx, Ux = run('xla')
    tp, Up = run('pallas')
    assert tx.shape == tp.shape
    np.testing.assert_allclose(tp[:, 1], tx[:, 1], rtol=1e-5)   # E
    np.testing.assert_allclose(Up, Ux, rtol=0, atol=1e-5)


def test_ensemble_pallas_backend_matches_xla():
    """The vmapped UQ ensemble runs the pallas kernels (traced A0/A1
    scalars ride in SMEM; vmap batches the kernel grid)."""
    from chsimpy_tpu import material
    from chsimpy_tpu.ensemble import EnsembleSolver

    def run(backend):
        p = ct.Parameters()
        p.N = 32
        p.ntmax = 20
        p.no_gui = True
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.precision = 'float32'
        p.kernel_backend = backend
        A0 = material.A0(p.temp)
        A1 = material.A1(p.temp)
        pairs = np.array([[A0, A1], [A0 * 1.004, A1 * 0.997]])
        ens = EnsembleSolver(p, pairs)
        ens.prepare()
        return ens.solve_or_resume(p.ntmax)

    sx = run('xla')
    sp = run('pallas')
    for a, b in zip(sx, sp):
        assert a.computed_steps == b.computed_steps
        np.testing.assert_allclose(np.asarray(a.U), np.asarray(b.U),
                                   rtol=0, atol=1e-4)


def test_band_tile_fits_scoped_vmem():
    """The stats band tiles must keep the double-buffered operand blocks
    under the TPU's ~16 MiB scoped-VMEM limit (measured OOM at
    (128, 4096) x 4 f32 operands = 16.28M)."""
    budget = 12 * 2 ** 20
    for N in (512, 1024, 2048, 4096, 8192):
        for itemsize, n_ops in ((4, 4), (8, 4), (4, 6)):
            tn = pk._band_tile(N, n_ops=n_ops, itemsize=itemsize)
            assert N % tn == 0
            assert (tn * N * itemsize * n_ops * 2 <= budget) or tn == 8


def test_f64_pallas_dispatch_falls_back_to_xla(monkeypatch):
    """With kernel_backend='pallas' and an f64 field on a non-interpret
    (real TPU) backend, mu/stats must route to the XLA chains — Mosaic
    has no f64 vector type (round-2.8 post-mortem in PERFORMANCE.md)."""
    import jax.numpy as jnp
    from chsimpy_tpu.core import stepper as st

    monkeypatch.setattr(pk, '_interpret', lambda: False)
    assert not pk.supports_dtype(jnp.float64)
    assert pk.supports_dtype(jnp.float32)

    cfg = st.StepConfig(N=16, dtype='float64', RT=7676.0, BRT=69084.0,
                        B=9.0, Amr=0.005, L=2005.0, delx=2005.0 / 15,
                        delx2=(2005.0 / 15) ** 2, M_tilde=1.0,
                        threshold=0.9, kernel_backend='pallas',
                        fast_stats=True)
    consts = {'A0': jnp.float64(186.0), 'A1': jnp.float64(-0.36),
              'kappa_tilde': jnp.float64(3e-4)}
    U = jnp.full((16, 16), 0.875, jnp.float64)
    E = jnp.ones((16, 16), jnp.float64)
    # would raise inside pallas_call (interpret=False on CPU) if the
    # dispatch still took the kernel path
    mu = st._nonlinear_term(cfg, consts, U)
    stats = st._stats(cfg, consts, U, E)
    assert np.isfinite(np.asarray(mu)).all()
    assert all(np.isfinite(float(s)) for s in stats)
