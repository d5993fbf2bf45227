"""Feature-interaction tests: combinations the per-feature tests miss."""

import numpy as np

import chsimpy_tpu as ct


def params(**kw):
    p = ct.Parameters()
    p.N = 32
    p.ntmax = 40
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def test_adaptive_plus_jitter():
    p = params(N=16, ntmax=550, generator='uniform', jitter=0.01,
               adaptive_time=True)
    sol = ct.Simulator(p).solve()
    assert sol.computed_steps == 550
    td = sol.timedata.data()
    assert np.isfinite(td).all()
    # adaptive kicked in after step 500
    assert td[-1, 8] != td[0, 8]


def test_sharded_float32():
    p32 = params(N=64, precision='float32', mesh_shape=(2, 4))
    ref = params(N=64, precision='float32')
    s1 = ct.Simulator(p32).solve()
    s2 = ct.Simulator(ref).solve()
    np.testing.assert_allclose(np.asarray(s1.U), np.asarray(s2.U),
                               rtol=0, atol=1e-5)


def test_sharded_plus_adaptive():
    pm = params(N=32, ntmax=520, adaptive_time=True, mesh_shape=(2, 2))
    pr = params(N=32, ntmax=520, adaptive_time=True)
    s1 = ct.Simulator(pm).solve()
    s2 = ct.Simulator(pr).solve()
    td1, td2 = s1.timedata.data(), s2.timedata.data()
    np.testing.assert_allclose(td1[:, 8], td2[:, 8], rtol=1e-9)  # delt path
    np.testing.assert_allclose(td1[:, 1], td2[:, 1], rtol=1e-10)


def test_ensemble_batched_wider_than_width():
    """-P narrower than R: members run in sequential device batches."""
    from chsimpy_tpu import material
    from chsimpy_tpu.experiment import ExperimentParams, run_experiment_batch
    p = params(N=16, ntmax=15)
    p.yaml = False
    p.export_csv = None
    ep = ExperimentParams()
    ep.runs = 5
    ep.A_seed = 85972
    ep.processes = 2  # batch width 2 -> 3 batches
    results = run_experiment_batch(p, ep, progress=False)
    assert len(results) == 5
    assert sorted(r[9] for r in results) == [0, 1, 2, 3, 4]


def test_checkpoint_of_sharded_run(tmp_path):
    from chsimpy_tpu.checkpoint import restore_solver, save_checkpoint
    p = params(N=32, mesh_shape=(2, 2))
    s = ct.Solver(p)
    s.prepare()
    s.solve_or_resume(20)
    f = str(tmp_path / 'c.npz')
    save_checkpoint(f, s)
    s2 = restore_solver(f)  # restores (mesh re-created from params)
    s2.solve_or_resume(20)
    # compare against uninterrupted sharded run with same boundary
    pr = params(N=32, mesh_shape=(2, 2))
    r = ct.Solver(pr)
    r.prepare()
    r.solve_or_resume(20)
    r.solve_or_resume(20)
    np.testing.assert_allclose(np.asarray(s2.solution.U),
                               np.asarray(r.solution.U), rtol=0, atol=1e-13)
