"""Precision-mode tests: float32 fast mode must track the float64 trajectory
macroscopically, and the device-jitter backend must be a working (seeded,
reproducible) alternative to the host stream."""

import numpy as np

import chsimpy_tpu as ct


def params(**kw):
    p = ct.Parameters()
    p.N = 32
    p.ntmax = 60
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def test_float32_tracks_float64():
    s64 = ct.Simulator(params(precision='float64')).solve()
    s32 = ct.Simulator(params(precision='float32')).solve()
    assert s32.computed_steps == s64.computed_steps
    td64 = s64.timedata.data()
    td32 = s32.timedata.data()
    # E in fast mode: f32 arithmetic => ~1e-5 relative agreement early on
    np.testing.assert_allclose(td32[:20, 1], td64[:20, 1], rtol=1e-4)
    np.testing.assert_allclose(s32.U, s64.U, rtol=0, atol=1e-2)
    assert s32.U.dtype == np.float32 or np.asarray(s32.U).dtype == np.float32


def test_float32_field_dtype():
    p = params(precision='float32', ntmax=5)
    solver = ct.Solver(p)
    solver.prepare()
    solver.solve_or_resume(5)
    assert solver._state.U.dtype == np.float32
    # row buffer stays f64 (time/energy bookkeeping)
    assert solver._state.rowbuf.dtype == np.float64


def test_device_jitter_reproducible():
    p1 = params(N=16, ntmax=20, generator='uniform', jitter=0.01,
                jitter_backend='device')
    p2 = params(N=16, ntmax=20, generator='uniform', jitter=0.01,
                jitter_backend='device')
    s1 = ct.Simulator(p1).solve()
    s2 = ct.Simulator(p2).solve()
    np.testing.assert_array_equal(s1.U, s2.U)  # same seed -> same threefry


def test_device_jitter_differs_from_no_jitter():
    pj = params(N=16, ntmax=20, generator='uniform', jitter=0.01,
                jitter_backend='device')
    p0 = params(N=16, ntmax=20, generator='uniform')
    sj = ct.Simulator(pj).solve()
    s0 = ct.Simulator(p0).solve()
    assert not np.allclose(sj.U, s0.U)


def test_jitter_out_of_range_ignored():
    # reference: jitter applied only when 0 < jitter < 0.1 (solver.py:210)
    pj = params(N=16, ntmax=20, generator='uniform', jitter=0.5)
    p0 = params(N=16, ntmax=20, generator='uniform')
    sj = ct.Simulator(pj).solve()
    s0 = ct.Simulator(p0).solve()
    np.testing.assert_array_equal(sj.U, s0.U)


def test_otf_coeffs_f32_tracks_stored_grids():
    """On-the-fly Seig/CHeig rebuild (get_coefficients_axis): the only
    numerical delta vs the stored grids is <=1 ULP on the leig broadcast
    add, so the f32 split trajectory must agree to ~1e-8 relative in E
    (the route's own f32 noise vs f64 truth is ~3e-6)."""
    base = dict(N=64, ntmax=120, precision='float32',
                transform_backend='split')
    s0 = ct.Simulator(params(otf_coeffs=0, **base)).solve()
    s1 = ct.Simulator(params(otf_coeffs=1, **base)).solve()
    assert s1.computed_steps == s0.computed_steps
    E0 = np.asarray(s0.E[:s0.computed_steps])
    E1 = np.asarray(s1.E[:s1.computed_steps])
    np.testing.assert_allclose(E1, E0, rtol=1e-7)


def test_otf_coeffs_f64_bit_identical():
    """In float64 the axis rebuild reproduces the stored grids bit-for-
    bit on the CPU backend (f64(e_i)+f64(e_j) IS how the grid was built),
    for both the split and the rfold-permuted ozaki basis orders."""
    for route, adaptive in (('split', False), ('ozaki', False),
                            ('split', True)):
        base = dict(N=32, ntmax=60, precision='float64',
                    transform_backend=route, adaptive_time=adaptive)
        s0 = ct.Simulator(params(otf_coeffs=0, **base)).solve()
        s1 = ct.Simulator(params(otf_coeffs=1, **base)).solve()
        np.testing.assert_array_equal(np.asarray(s1.U), np.asarray(s0.U))
        np.testing.assert_array_equal(np.asarray(s1.E), np.asarray(s0.E))


def test_otf_coeffs_resolver_gate():
    from chsimpy_tpu.core.solver import resolve_otf_coeffs
    p = params(N=4096, precision='float32')
    assert resolve_otf_coeffs(p) is True
    assert resolve_otf_coeffs(params(N=1024, precision='float32')) is True
    assert resolve_otf_coeffs(params(N=512, precision='float32')) is False
    assert resolve_otf_coeffs(params(N=4096, precision='float64')) is False
    p = params(N=4096, precision='float32', matmul_precision='highest')
    assert resolve_otf_coeffs(p) is False      # accuracy-pinned run
    p = params(N=4096, precision='float32')
    p.mesh_shape = (1, 2)
    assert resolve_otf_coeffs(p) is False      # single-device only (auto)
    p = params(N=512, precision='float64', otf_coeffs=1)
    assert resolve_otf_coeffs(p) is True       # explicit pin wins
