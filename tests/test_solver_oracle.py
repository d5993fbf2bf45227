"""Property tests: the jitted device solver vs the NumPy/SciPy oracle
(tests/oracle.py) on small grids — energies, stats, early stop, chunking
invariance, resume semantics."""

import numpy as np
import pytest

import chsimpy_tpu as ct
from chsimpy_tpu.derived import Derived
from chsimpy_tpu.rng import FieldGenerator

import oracle


def small_params(N=32, ntmax=60, **kw):
    p = ct.Parameters()
    p.N = N
    p.ntmax = ntmax
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def oracle_run(p, nsteps=None, **kw):
    d = Derived.from_params(p)
    c = oracle.derived_constants(p.N, p.L, p.R, p.temp, p.B, d.A0, d.A1,
                                 d.kappa_tilde)
    if p.Uinit_file:
        U0 = None
    else:
        U0 = FieldGenerator(p.generator, p.N, p.seed).initial_field(p.XXX)
    kw.setdefault('full_sim', p.full_sim)
    return oracle.run(U0, c, p.delt, nsteps or p.ntmax, p.threshold,
                      p.M_tilde, **kw)


def compare_rows(rows_ref, rows_ours, rtol_E=1e-11, rtol_other=2e-5):
    n = min(len(rows_ref), len(rows_ours))
    assert n == len(rows_ref) == len(rows_ours)
    a, b = rows_ref[:n], rows_ours[:n]
    assert np.array_equal(a[:, 0], b[:, 0])          # it
    np.testing.assert_allclose(b[:, 1], a[:, 1], rtol=rtol_E)   # E
    np.testing.assert_allclose(b[:, 8], a[:, 8], rtol=1e-14)    # delt
    np.testing.assert_allclose(b[:, 4], a[:, 4], rtol=1e-12)    # domtime
    # E2/Ra/PS/L2 suffer gradient cancellation amplification of the DCT
    # algorithm difference; bounded but looser
    np.testing.assert_allclose(b[:, 2], a[:, 2], rtol=rtol_other)
    np.testing.assert_allclose(b[:, 7], a[:, 7], rtol=rtol_other)


@pytest.mark.parametrize('gen', ['lcg', 'uniform', 'sobol', 'simplex'])
def test_solver_matches_oracle_generators(gen):
    p = small_params(generator=gen)
    sim = ct.Simulator(p)
    sol = sim.solve()
    ref = oracle_run(p)
    assert sol.computed_steps == ref['computed_steps']
    compare_rows(ref['rows'], sol.timedata.data())
    np.testing.assert_allclose(sol.U, ref['U'], rtol=0, atol=1e-11)


def test_chunking_invariance_bitexact():
    """Internal chunk size must not change a single bit of the results."""
    p1 = small_params(ntmax=50, chunk_size=1024)
    p2 = small_params(ntmax=50, chunk_size=7)
    s1 = ct.Simulator(p1).solve()
    s2 = ct.Simulator(p2).solve()
    assert np.array_equal(s1.timedata.data(), s2.timedata.data())
    assert np.array_equal(s1.U, s2.U)


def test_resume_matches_oracle_chunked():
    """solve_or_resume(k) repeatedly == reference update_every semantics:
    the spectral image is recomputed from U at each API entry."""
    p = small_params(ntmax=40)
    solver = ct.Solver(p)
    solver.prepare()
    for _ in range(4):
        solver.solve_or_resume(10)
    # oracle equivalent: 4 segments with dct recomputed at each entry
    d = Derived.from_params(p)
    c = oracle.derived_constants(p.N, p.L, p.R, p.temp, p.B, d.A0, d.A1,
                                 d.kappa_tilde)
    U0 = FieldGenerator('lcg', p.N, p.seed).initial_field(p.XXX)
    import scipy.fftpack as scifft
    U = U0.copy()
    CHeig, Seig = oracle.coeff_grids(p.N, c['kappa_tilde'], p.delt,
                                     c['delx2'])
    total = 0
    for seg in range(4):
        hat_U = scifft.dctn(U, norm='ortho')
        steps = 9 if seg == 0 else 10  # first entry consumes the prepare row
        for _ in range(steps):
            mu = oracle.chemical_potential(U, c)
            hat_U = (hat_U + Seig * scifft.dctn(mu, norm='ortho')) / CHeig
            U = scifft.idctn(hat_U, norm='ortho')
            total += 1
    assert solver.solution.computed_steps == total + 1
    np.testing.assert_allclose(solver.solution.U, U, rtol=0, atol=1e-11)


def test_early_stop_energy():
    """Early stop (no full_sim) stops at the first energy fall with
    tau0/t0 recorded; verified against the oracle's step count."""
    p = small_params(N=64, ntmax=6000, full_sim=False)
    sol = ct.Simulator(p).solve()
    ref = oracle_run(p, nsteps=6000, full_sim=False)
    assert ref['stop'] == 'energy'
    assert sol.stop_reason == 'energy'
    assert sol.computed_steps == ref['computed_steps']
    assert sol.tau0 == ref['tau0']
    np.testing.assert_allclose(sol.t0, ref['t0'], rtol=1e-12)


def test_full_sim_records_tau0_and_continues():
    p = small_params(N=64, ntmax=5500, full_sim=True)
    sol = ct.Simulator(p).solve()
    ref = oracle_run(p, nsteps=5500, full_sim=True)
    assert sol.stop_reason == 'None'
    assert sol.computed_steps == ref['computed_steps'] == 5500
    assert sol.tau0 == ref['tau0'] > 0


def test_time_limit_stop():
    # time_max in minutes; delt/M_tilde seconds of simulated time per step
    p = small_params(N=16, ntmax=10000)
    p.time_max = (p.delt / p.M_tilde) * 50 / 60  # ~50 steps worth
    sol = ct.Simulator(p).solve()
    ref = oracle_run(p, nsteps=10000,
                     time_limit=p.time_max * 60)
    assert sol.stop_reason == 'time-limit'
    assert ref['stop'] == 'time-limit'
    assert sol.computed_steps == ref['computed_steps']
    # aborted step accumulated time but did not advance the field
    solver_tds = ref['tds']
    np.testing.assert_allclose(solver_tds, sol.computed_steps * p.delt,
                               rtol=1e-12)


def test_jitter_stream_matches_oracle():
    p = small_params(N=16, ntmax=30, generator='uniform', jitter=0.01)
    sol = ct.Simulator(p).solve()
    # oracle with the same PCG64 stream: first draw is U0, rest are jitter
    gen = FieldGenerator('uniform', p.N, p.seed)
    U0 = gen.initial_field(p.XXX)
    samples = [gen.next_sample() for _ in range(40)]
    d = Derived.from_params(p)
    c = oracle.derived_constants(p.N, p.L, p.R, p.temp, p.B, d.A0, d.A1,
                                 d.kappa_tilde)
    ref = oracle.run(U0, c, p.delt, 30, p.threshold, p.M_tilde,
                     jitter=0.01, jitter_samples=samples, full_sim=True)
    assert sol.computed_steps == ref['computed_steps']
    np.testing.assert_allclose(sol.U, ref['U'], rtol=0, atol=1e-11)


def test_jitter_simplex_static_field():
    p = small_params(N=16, ntmax=20, generator='simplex', jitter=0.02)
    sol = ct.Simulator(p).solve()
    gen = FieldGenerator('simplex', p.N, p.seed)
    U0 = gen.initial_field(p.XXX)
    field = gen.next_sample()
    d = Derived.from_params(p)
    c = oracle.derived_constants(p.N, p.L, p.R, p.temp, p.B, d.A0, d.A1,
                                 d.kappa_tilde)
    ref = oracle.run(U0, c, p.delt, 20, p.threshold, p.M_tilde,
                     jitter=0.02, jitter_samples=[field] * 30, full_sim=True)
    np.testing.assert_allclose(sol.U, ref['U'], rtol=0, atol=1e-11)


def test_adaptive_time_matches_oracle():
    p = small_params(N=16, ntmax=560, adaptive_time=True)
    p.delt_max = 9e-8
    sol = ct.Simulator(p).solve()
    ref = oracle_run(p, nsteps=560, adaptive=True,
                     delt_base=p.delt, delt_max=p.delt_max)
    td = sol.timedata.data()
    np.testing.assert_allclose(td[:, 8], ref['rows'][:, 8], rtol=1e-10)
    assert sol.computed_steps == ref['computed_steps']


def test_uinit_file_roundtrip(tmp_path):
    from chsimpy_tpu.io import csvio
    rng = np.random.default_rng(5)
    U0 = 0.875 + 0.001 * rng.random((16, 16))
    f = tmp_path / 'u0.csv'
    csvio.csv_export_matrix(U0, str(f))
    p = small_params(N=16, ntmax=10)
    p.Uinit_file = str(f)
    sim = ct.Simulator(p)
    np.testing.assert_allclose(sim.solver.U_init, U0, rtol=0, atol=1e-15)


def test_wrong_uinit_shape():
    p = small_params(N=16)
    with pytest.raises(ValueError):
        ct.Solver(p, U_init=np.zeros((8, 8)))
