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
