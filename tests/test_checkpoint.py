"""Checkpoint/resume: a run interrupted at step k and resumed from disk must
reproduce the uninterrupted run bit-for-bit (the spectral image is recomputed
from U at every solve entry, so a checkpoint boundary == a resume boundary)."""

import numpy as np

import chsimpy_tpu as ct
from chsimpy_tpu.checkpoint import restore_solver, save_checkpoint


def params(**kw):
    p = ct.Parameters()
    p.N = 32
    p.ntmax = 40
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def test_checkpoint_resume_bitexact(tmp_path):
    # uninterrupted: 40 steps with a resume boundary at 20 (so both paths
    # recompute the spectral image at the same point)
    p = params()
    ref = ct.Solver(p)
    ref.prepare()
    ref.solve_or_resume(20)
    ref.solve_or_resume(20)

    # interrupted at 20 + checkpoint + restore + 20 more
    p2 = params()
    s = ct.Solver(p2)
    s.prepare()
    s.solve_or_resume(20)
    f = str(tmp_path / 'ckpt.npz')
    save_checkpoint(f, s)
    del s
    s2 = restore_solver(f)
    s2.solve_or_resume(20)

    assert s2.solution.computed_steps == ref.solution.computed_steps
    np.testing.assert_array_equal(s2.solution.U, ref.solution.U)
    np.testing.assert_array_equal(s2.solution.timedata.data(),
                                  ref.solution.timedata.data())


def test_checkpoint_preserves_jitter_stream(tmp_path):
    p = params(N=16, generator='uniform', jitter=0.01)
    ref = ct.Solver(p)
    ref.prepare()
    ref.solve_or_resume(10)
    ref.solve_or_resume(10)

    p2 = params(N=16, generator='uniform', jitter=0.01)
    s = ct.Solver(p2)
    s.prepare()
    s.solve_or_resume(10)
    f = str(tmp_path / 'ckpt.npz')
    save_checkpoint(f, s)
    s2 = restore_solver(f)
    s2.solve_or_resume(10)
    np.testing.assert_array_equal(s2.solution.U, ref.solution.U)


def test_checkpoint_roundtrip_params(tmp_path):
    p = params(N=16, seed=99, precision='float32')
    s = ct.Solver(p)
    s.prepare()
    s.solve_or_resume(5)
    f = str(tmp_path / 'c.npz')
    save_checkpoint(f, s)
    s2 = restore_solver(f)
    assert s2.params.N == 16
    assert s2.params.seed == 99
    assert s2.params.precision == 'float32'
    assert s2.solution.computed_steps == s.solution.computed_steps


def test_ensemble_checkpoint_resume_bitexact(tmp_path):
    """Interrupted+resumed ensemble == uninterrupted ensemble, bit for
    bit (each member's field, counters, and full trace)."""
    import numpy as np

    from chsimpy_tpu import material
    from chsimpy_tpu.checkpoint import (restore_ensemble,
                                        save_ensemble_checkpoint)
    from chsimpy_tpu.ensemble import EnsembleSolver

    def params():
        p = ct.Parameters()
        p.N = 32
        p.ntmax = 40
        p.no_gui = True
        p.full_sim = True
        p.generator = 'uniform'
        p.jitter = 0.01  # host stream position must survive the resume
        p.kappa_tilde = 2.98911291966116e-4
        return p

    A0 = material.A0(923.15)
    A1 = material.A1(923.15)
    pairs = np.array([[A0, A1], [A0 * 1.004, A1 * 0.997]])

    # reference run: 40 steps with a resume boundary at 20, so both paths
    # recompute the spectral image at the same entry points (the
    # reference-inherited entry semantic, chsimpy/solver.py:159)
    full = EnsembleSolver(params(), pairs)
    full.prepare()
    full.solve_or_resume(20)
    sols_full = full.solve_or_resume(20)

    part = EnsembleSolver(params(), pairs)
    part.prepare()
    part.solve_or_resume(20)
    f = tmp_path / 'ens.ckpt.npz'
    save_ensemble_checkpoint(str(f), part)

    resumed = restore_ensemble(str(f))
    sols_res = resumed.solve_or_resume(20)

    for a, b in zip(sols_full, sols_res):
        assert a.computed_steps == b.computed_steps
        np.testing.assert_array_equal(np.asarray(a.U), np.asarray(b.U))
        np.testing.assert_array_equal(a.timedata.data(), b.timedata.data())
