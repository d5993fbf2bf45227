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
