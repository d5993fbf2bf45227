"""Reference parity: solve_or_resume after a stop CONTINUES the simulation
(the reference loop never checks stop_reason, chsimpy/solver.py:165)."""

import numpy as np

import chsimpy_tpu as ct


def params(**kw):
    p = ct.Parameters()
    p.N = 64
    p.no_gui = True
    p.update_every = None
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def test_continue_after_energy_stop():
    p = params(ntmax=6000, full_sim=False)
    s = ct.Solver(p)
    s.prepare()
    s.solve_or_resume(6000)
    assert s.solution.stop_reason == 'energy'
    stopped_at = s.solution.computed_steps
    # re-entry continues past the stop (reference behavior)
    s.solve_or_resume(10)
    assert s.solution.computed_steps > stopped_at


def test_continue_after_time_limit():
    p = params(N=16, ntmax=10000)
    p.time_max = (p.delt / p.M_tilde) * 20 / 60
    s = ct.Solver(p)
    s.prepare()
    s.solve_or_resume(10000)
    assert s.solution.stop_reason == 'time-limit'
    steps = s.solution.computed_steps
    # time already exhausted: re-entry aborts again without advancing U
    s.solve_or_resume(10)
    assert s.solution.stop_reason == 'time-limit'
    assert s.solution.computed_steps == steps
