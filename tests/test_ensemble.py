"""Ensemble (UQ) tests: the vmapped batch must reproduce per-member
single-run results bit-for-bit (same jaxpr, same math — only batching
differs), honor per-member early stop, and shard over an 'ens' mesh axis."""

import numpy as np
import pytest

import chsimpy_tpu as ct
from chsimpy_tpu import material
from chsimpy_tpu.ensemble import EnsembleSolver
from chsimpy_tpu.experiment import (ExperimentParams, generate_A_factors,
                                    run_experiment_batch, aggregate_results)


def base_params(**kw):
    p = ct.Parameters()
    p.N = 32
    p.ntmax = 40
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4  # skip per-member sympy in tests
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def a_pairs(p, factors):
    A0 = material.A0(p.temp)
    A1 = material.A1(p.temp)
    return np.array([[A0 * f0, A1 * f1] for f0, f1 in factors])


def test_ensemble_matches_single_runs():
    p = base_params()
    pairs = a_pairs(p, [(1.0, 1.0), (1.004, 0.997), (0.995, 1.005)])
    ens = EnsembleSolver(p, pairs)
    ens.prepare()
    sols = ens.solve_or_resume(p.ntmax)
    assert len(sols) == 3
    for i, (A0, A1) in enumerate(pairs):
        ps = base_params()
        ps.A0_const = float(A0)
        ps.A1_const = float(A1)
        ref = ct.Simulator(ps).solve()
        assert sols[i].computed_steps == ref.computed_steps
        np.testing.assert_allclose(sols[i].U, ref.U, rtol=0, atol=1e-13)
        np.testing.assert_allclose(sols[i].timedata.data(),
                                   ref.timedata.data(), rtol=1e-12)


def test_ensemble_honors_pinned_fast_knobs():
    """Explicit --inv-band / --otf-coeffs / --ozaki-inv-pairs pins reach
    the vmapped program (auto keeps them off under vmap), and a pinned
    ensemble matches pinned single runs in the same agreement class as
    the unpinned route."""
    p = base_params(precision='float32', transform_backend='split',
                    N=32, ntmax=30)
    p.inv_band = 8
    p.otf_coeffs = 1
    pairs = a_pairs(p, [(1.0, 1.0), (1.004, 0.997)])
    ens = EnsembleSolver(p, pairs)
    assert ens.cfg.inv_band == 8
    assert ens.cfg.otf_coeffs
    ens.prepare()
    sols = ens.solve_or_resume(p.ntmax)
    for i, (A0, A1) in enumerate(pairs):
        ps = base_params(precision='float32', transform_backend='split',
                         N=32, ntmax=30)
        ps.inv_band = 8
        ps.otf_coeffs = 1
        ps.A0_const = float(A0)
        ps.A1_const = float(A1)
        ref = ct.Simulator(ps).solve()
        assert sols[i].computed_steps == ref.computed_steps
        np.testing.assert_allclose(sols[i].U, ref.U, rtol=0, atol=1e-6)
    # the f64 ozaki inverse-pair pin threads to the vmapped rfold too
    p64 = base_params(precision='float64', transform_backend='ozaki',
                      N=64, ntmax=10)
    p64.ozaki_inv_pairs = (4, 6)
    ens64 = EnsembleSolver(p64, a_pairs(p64, [(1.0, 1.0), (0.998, 1.002)]))
    assert ens64.cfg.ozaki_inv_pairs == (4, 6)


def test_ensemble_per_member_early_stop():
    """Members stop at different steps; finished members stay frozen."""
    p = base_params(N=64, ntmax=6000, full_sim=False)
    pairs = a_pairs(p, [(1.0, 1.0), (1.005, 1.005)])
    ens = EnsembleSolver(p, pairs)
    ens.prepare()
    sols = ens.solve_or_resume(p.ntmax)
    stops = [s.computed_steps for s in sols]
    assert all(s.stop_reason == 'energy' for s in sols)
    assert stops[0] != stops[1]  # perturbed physics separates earlier/later
    # each member matches its own single run exactly
    for i, (A0, A1) in enumerate(pairs):
        ps = base_params(N=64, ntmax=6000, full_sim=False)
        ps.A0_const = float(A0)
        ps.A1_const = float(A1)
        ref = ct.Simulator(ps).solve()
        assert sols[i].computed_steps == ref.computed_steps
        assert sols[i].tau0 == ref.tau0


def test_ensemble_sharded_over_ens_axis():
    import jax
    from chsimpy_tpu.parallel.mesh import make_ensemble_mesh
    p = base_params()
    pairs = a_pairs(p, [(1.0 + 0.001 * i, 1.0 - 0.001 * i)
                        for i in range(4)])
    mesh = make_ensemble_mesh(4)
    ens = EnsembleSolver(p, pairs, mesh=mesh)
    ens.prepare()
    sols = ens.solve_or_resume(p.ntmax)
    ref = EnsembleSolver(p, pairs)
    ref.prepare()
    ref_sols = ref.solve_or_resume(p.ntmax)
    for s, r in zip(sols, ref_sols):
        np.testing.assert_allclose(s.U, r.U, rtol=0, atol=1e-13)


def test_generate_A_factors_uniform_matches_reference_stream():
    ep = ExperimentParams()
    ep.runs = 5
    ep.A_seed = 85972
    rv = generate_A_factors(ep)
    rng = np.random.Generator(np.random.PCG64(85972))
    expected = rng.uniform(0.995, 1.005, size=(5, 2))
    np.testing.assert_array_equal(rv, expected)


def test_generate_A_factors_independent():
    ep = ExperimentParams()
    ep.runs = 3
    ep.A_seed = 1
    ep.independent = True
    rv = generate_A_factors(ep)
    assert rv.shape == (6, 2)
    assert np.all(rv[:3, 1] == 1.0)  # A1 fixed while A0 varies
    assert np.all(rv[3:, 0] == 1.0)


def test_generate_A_factors_grid():
    ep = ExperimentParams()
    ep.runs = 9
    ep.A_source = 'grid'
    rv = generate_A_factors(ep)
    assert rv.shape == (9, 2)
    assert ep.runs == 9
    xv = np.linspace(0.995, 1.005, 3)
    np.testing.assert_allclose(sorted(set(rv[:, 0])), xv)


def test_generate_A_factors_sobol():
    pytest.importorskip('scipy')
    from scipy.stats import qmc
    ep = ExperimentParams()
    ep.runs = 4
    ep.A_source = 'sobol'
    ep.A_seed = 85972
    rv = generate_A_factors(ep)
    qrng = qmc.Sobol(d=2, seed=85972)
    exp = qmc.scale(qrng.random_base2(2), 0.995, 1.005)[:4]
    np.testing.assert_array_equal(rv, exp)


def test_experiment_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = base_params(N=32, ntmax=25)
    p.file_id = 'exp-test'
    p.yaml = True
    p.export_csv = 'U,E2'
    p.compress_csv = False
    ep = ExperimentParams()
    ep.runs = 2
    ep.A_seed = 85972
    results = run_experiment_batch(p, ep, progress=False)
    assert len(results) == 2
    df_results, df_agg = aggregate_results(results, p.file_id)
    assert (tmp_path / 'exp-test-results.csv').exists()
    assert (tmp_path / 'exp-test-results-agg.csv').exists()
    assert (tmp_path / 'exp-test-run0.solution.yaml').exists()
    assert (tmp_path / 'exp-test-run1.solution.U.csv').exists()
    assert (tmp_path / 'exp-test-run0.solution.E2.csv').exists()
    assert df_results.shape[0] == 2
    assert 'cv' in df_agg.index


def test_experiment_A_file_source(tmp_path, monkeypatch):
    """--A-source=<file>: explicit (A0, A1) pairs from CSV."""
    monkeypatch.chdir(tmp_path)
    import chsimpy_tpu.experiment as exp
    from chsimpy_tpu.io import csvio
    p = base_params(N=16, ntmax=10)
    p.file_id = 'afile'
    p.yaml = False
    p.export_csv = None
    A0 = material.A0(p.temp)
    A1 = material.A1(p.temp)
    pairs = np.array([[A0, A1], [A0 * 1.01, A1 * 0.99]])
    f = tmp_path / 'alist.csv'
    csvio.csv_export_matrix(pairs, str(f))
    ep = ExperimentParams()
    ep.runs = 2
    A_list = csvio.csv_import_matrix(str(f))
    results = exp.run_experiment_batch(p, ep, A_list=A_list, progress=False)
    assert len(results) == 2
    # A0/A1 taken verbatim from the file
    np.testing.assert_allclose(results[0][0], A0, rtol=1e-12)
    np.testing.assert_allclose(results[1][0], A0 * 1.01, rtol=1e-12)
    # factors are undefined for file sources
    assert results[0][10] is None


def test_experiment_png_renders_per_run(tmp_path, monkeypatch):
    """--png writes one PNG per experiment run (reference renders each
    member, chsimpy/experiment.py:104-109)."""
    monkeypatch.chdir(tmp_path)
    p = base_params(N=32, ntmax=15)
    p.file_id = 'pngexp'
    p.yaml = False
    p.export_csv = None
    p.png = True
    p.no_gui = True
    ep = ExperimentParams()
    ep.runs = 2
    ep.A_seed = 85972
    results = run_experiment_batch(p, ep, progress=False)
    assert len(results) == 2
    for r in range(2):
        png = tmp_path / f'pngexp-run{r}.png'
        assert png.exists() and png.stat().st_size > 1000


def test_ensemble_mixed_entry_semantics_rejected():
    """Fresh (computed_steps==1) and resumed members cannot share one
    solve_or_resume call — the iteration-count semantics differ."""
    import jax.numpy as jnp
    p = base_params()
    pairs = a_pairs(p, [(1.0, 1.0), (1.004, 0.997)])
    ens = EnsembleSolver(p, pairs)
    ens.prepare()
    ens.solve_or_resume(5)
    steps = np.asarray(ens._states.computed_steps).copy()
    steps[0] = 1  # corrupt: member 0 looks fresh, member 1 resumed
    ens._states = ens._states.replace(
        computed_steps=jnp.asarray(steps))
    with pytest.raises(AssertionError, match='entry semantics'):
        ens.solve_or_resume(5)


def test_experiment_live_view(tmp_path, monkeypatch):
    """--live-view refreshes a member-0 map about every --update-every
    steps (beyond-reference nicety; the reference forces no_gui in
    experiments)."""
    monkeypatch.chdir(tmp_path)
    p = base_params(N=16, ntmax=21)
    p.file_id = 'liveexp'
    p.yaml = False
    p.export_csv = None
    p.update_every = 5
    ep = ExperimentParams()
    ep.runs = 2
    ep.A_seed = 85972
    ep.live_view = True
    results = run_experiment_batch(p, ep, progress=False)
    assert len(results) == 2


def test_experiment_live_view_requires_update_every():
    from chsimpy_tpu.experiment import ExperimentCLIParser
    import pytest as _pytest
    parser = ExperimentCLIParser()
    with _pytest.raises(SystemExit):
        parser.get_parameters(['--live-view', '-N', '16'])


def test_ensemble_ozaki_matches_single_runs():
    """The int8 ozaki transform composes with the vmapped ensemble
    bit-exactly (integer stages are vmap-invariant)."""
    from chsimpy_tpu.core.solver import Solver

    def params():
        return base_params(N=32, ntmax=10, precision='float64',
                           transform_backend='ozaki')

    p = params()
    A0 = p.func_A0(p.temp)
    A1 = p.func_A1(p.temp)
    pairs = np.array([[A0, A1], [A0 * 1.001, A1 * 0.999]])

    ens = EnsembleSolver(params(), pairs)
    ens.prepare()
    sols = ens.solve_or_resume(10)
    s = Solver(params())
    s.prepare()
    single = s.solve_or_resume(10)
    np.testing.assert_array_equal(np.asarray(sols[0].U),
                                  np.asarray(single.U))


def test_ensemble_fold_field_matches_natural():
    """--fold-field composes with the vmapped ensemble: every member's U
    trajectory is bit-identical to the natural-layout ensemble (the fold
    is pure data layout), with stream-jitter slabs folded so the same
    sample values land on the same original cells."""
    def run(fold):
        p = base_params(N=64, generator='uniform', jitter=0.01, seed=2023,
                        transform_backend='split')
        p.fold_field = fold
        pairs = a_pairs(p, [(1.0, 1.0), (1.004, 0.997)])
        ens = EnsembleSolver(p, pairs)
        ens.prepare()
        return ens.solve_or_resume(p.ntmax)

    nat = run(False)
    fol = run(True)
    for a, b in zip(nat, fol):
        assert a.computed_steps == b.computed_steps
        np.testing.assert_array_equal(np.asarray(b.U), np.asarray(a.U))
        # fold forces the restructured (fast) stats: ULP-order trace shift
        np.testing.assert_allclose(b.timedata.data(), a.timedata.data(),
                                   rtol=1e-12, atol=1e-13)


def test_ensemble_fold_field_adaptive_bit_matches_natural():
    """fold + adaptive + ensemble, all three together: the vmapped
    adapted() norm (row-unfolded operand + optimization_barrier) must
    keep every member's delt — and therefore U — bit-identical to the
    natural-layout ensemble.  Runs past the step-500 adaptation onset."""
    def run(fold):
        p = base_params(N=32, ntmax=560, transform_backend='split',
                        adaptive_time=True)
        p.fold_field = fold
        pairs = a_pairs(p, [(1.0, 1.0), (1.004, 0.997)])
        ens = EnsembleSolver(p, pairs)
        ens.prepare()
        return ens.solve_or_resume(p.ntmax)

    nat = run(False)
    fol = run(True)
    for a, b in zip(nat, fol):
        assert a.computed_steps == b.computed_steps
        da = np.asarray(a.timedata.data())[:, 8]
        db = np.asarray(b.timedata.data())[:, 8]
        assert da.max() > da[0]  # the adaptation actually fired
        np.testing.assert_array_equal(db, da)
        np.testing.assert_array_equal(np.asarray(b.U), np.asarray(a.U))


def test_ensemble_fold_field_guards():
    """Ensemble fold needs the split route and member-local fields."""
    from chsimpy_tpu.parallel.mesh import make_ensemble_mesh
    p = base_params(transform_backend='matmul')
    p.fold_field = True
    pairs = a_pairs(p, [(1.0, 1.0), (1.004, 0.997)])
    with pytest.raises(ValueError, match='split'):
        EnsembleSolver(p, pairs)
    p2 = base_params(transform_backend='split')
    p2.fold_field = True
    mesh = make_ensemble_mesh(2, (2, 2))
    with pytest.raises(ValueError, match='member-local'):
        EnsembleSolver(p2, pairs, mesh=mesh)
    # ens-only sharding is fine
    mesh_ens = make_ensemble_mesh(2, (1, 1))
    EnsembleSolver(p2, pairs, mesh=mesh_ens)


def test_ensemble_fold_checkpoint_natural_on_disk(tmp_path):
    """Checkpoints of a folded ensemble hold the NATURAL per-member
    fields on disk and resume bit-exactly (fold re-applied on restore)."""
    from chsimpy_tpu.checkpoint import (restore_ensemble,
                                        save_ensemble_checkpoint)

    def params():
        p = base_params(N=32, ntmax=40, transform_backend='split')
        p.fold_field = True
        return p

    pairs = a_pairs(params(), [(1.0, 1.0), (1.004, 0.997)])

    # uninterrupted folded run with the same re-entry boundary
    ref = EnsembleSolver(params(), pairs)
    ref.prepare()
    ref.solve_or_resume(15)
    sols_ref = ref.solve_or_resume(25, preserve_stops=True)

    part = EnsembleSolver(params(), pairs)
    part.prepare()
    part.solve_or_resume(15)
    f = str(tmp_path / 'fold.ens.ckpt.npz')
    save_ensemble_checkpoint(f, part)

    # the on-disk fields are the natural view (== solutions() view)
    z = np.load(f, allow_pickle=False)
    sols_part = part.solutions()
    for r in range(2):
        np.testing.assert_array_equal(np.asarray(z['U'])[r],
                                      np.asarray(sols_part[r].U))

    res = restore_ensemble(f)
    assert res.cfg.fold_field is True
    sols_res = res.solve_or_resume(25, preserve_stops=True)
    for a, b in zip(sols_ref, sols_res):
        assert a.computed_steps == b.computed_steps
        np.testing.assert_array_equal(np.asarray(b.U), np.asarray(a.U))


def test_experiment_checkpoint_restore(tmp_path, monkeypatch):
    """Experiment-level checkpoint/resume: an interrupted batch restores
    from the periodic snapshot and finishes exactly like an in-memory
    run that re-entered at the same boundary; completed-result rows and
    the batch cursor ride in the checkpoint header."""
    monkeypatch.chdir(tmp_path)
    from chsimpy_tpu.checkpoint import save_ensemble_checkpoint
    from chsimpy_tpu.experiment import postprocess_member

    def params():
        p = base_params(N=32, ntmax=30)
        p.file_id = 'expck'
        return p

    ep = ExperimentParams()
    ep.runs = 2
    ep.A_seed = 85972

    # the driver's A-pairs for this plan
    rv = generate_A_factors(ep)
    p0 = params()
    A0b, A1b = p0.func_A0(p0.temp), p0.func_A1(p0.temp)
    pairs = np.stack([rv[:, 0] * A0b, rv[:, 1] * A1b], axis=1)

    # reference: in-memory run with the SAME entry boundary (resume ==
    # re-entry, the reference-inherited semantic)
    ref = EnsembleSolver(params(), pairs)
    ref.prepare()
    ref.solve_or_resume(15)
    sols_ref = ref.solve_or_resume(15, preserve_stops=True)
    rows_ref = [postprocess_member(params(), s, i, rv[i, 0], rv[i, 1])
                for i, s in enumerate(sols_ref)]

    # interrupted run: 15 steps, then the driver-format checkpoint
    part = EnsembleSolver(params(), pairs)
    part.prepare()
    part.solve_or_resume(15)
    f = str(tmp_path / 'exp.ckpt.npz')
    from chsimpy_tpu.experiment import a_plan_digest
    save_ensemble_checkpoint(f, part, extra_header={
        'kind': 'experiment', 'nr_items': 2, 'width': 2, 'start': 0,
        'A_plan': a_plan_digest(pairs, rv), 'results': []})

    # restore through the real driver path
    p = params()
    p.restore_file = f
    results = run_experiment_batch(p, ep, progress=False)
    assert len(results) == 2
    for got, exp in zip(results, rows_ref):
        for g, e in zip(got, exp):
            if g is None or e is None:
                assert g is None and e is None
            else:
                assert float(g) == float(e)
    assert (tmp_path / 'expck-run0.solution.yaml').exists() is False  # no yaml flag
    # run plan mismatch is rejected
    p2 = params()
    p2.restore_file = f
    ep2 = ExperimentParams()
    ep2.runs = 3
    ep2.A_seed = 85972
    with pytest.raises(ValueError, match='same run plan'):
        run_experiment_batch(p2, ep2, progress=False)
    # same run COUNT but a different A-plan (other A-seed) must be
    # rejected too — otherwise the resume silently mixes two UQ designs
    p3 = params()
    p3.restore_file = f
    ep3 = ExperimentParams()
    ep3.runs = 2
    ep3.A_seed = 12345
    with pytest.raises(ValueError, match='same A-plan'):
        run_experiment_batch(p3, ep3, progress=False)


def test_experiment_periodic_checkpoint_written(tmp_path, monkeypatch):
    """--checkpoint-file/--checkpoint-every on the experiment driver
    writes driver-format snapshots at chunk boundaries."""
    monkeypatch.chdir(tmp_path)
    import numpy as _np
    from chsimpy_tpu.checkpoint import restore_ensemble

    p = base_params(N=32, ntmax=30)
    p.file_id = 'expper'
    p.chunk_size = 10
    p.checkpoint_file = str(tmp_path / 'per.ckpt.npz')
    p.checkpoint_every = 10
    ep = ExperimentParams()
    ep.runs = 2
    ep.A_seed = 85972
    run_experiment_batch(p, ep, progress=False)

    ens = restore_ensemble(p.checkpoint_file)
    extra = ens._ckpt_extra
    assert extra['kind'] == 'experiment'
    assert extra['nr_items'] == 2 and extra['start'] == 0
    steps = _np.asarray(ens._host_leaves(ens._states.computed_steps)[0])
    assert (steps > 1).all()


def test_experiment_host_pipeline_pool_matches_sync(tmp_path, monkeypatch):
    """The parallel host pipeline (export/render/postproc in spawn
    workers, overlapped with the device batches) produces exactly the
    rows and files of the synchronous path."""
    import filecmp

    def run(sub, procs):
        d = tmp_path / sub
        d.mkdir()
        monkeypatch.chdir(d)
        p = base_params(N=32, ntmax=20)
        p.file_id = 'hp'
        p.yaml = True
        p.export_csv = 'E2'
        p.compress_csv = False
        ep = ExperimentParams()
        ep.runs = 3
        ep.A_seed = 85972
        ep.processes = 2          # two device batches -> overlap engages
        ep.host_procs = procs
        return run_experiment_batch(p, ep, progress=False), d

    rows_sync, d_sync = run('sync', 1)
    rows_pool, d_pool = run('pool', 2)
    assert len(rows_pool) == 3
    # identical rows, in submission (run-id) order
    for a, b in zip(rows_sync, rows_pool):
        assert a == b
    for r in range(3):
        fa = d_sync / f'hp-run{r}.solution.E2.csv'
        fb = d_pool / f'hp-run{r}.solution.E2.csv'
        assert fa.exists() and fb.exists()
        assert filecmp.cmp(str(fa), str(fb), shallow=False)


def test_auto_batch_width_splits_for_host_overlap():
    """Auto -P splits a single-batch run in two (>= 8 members, host pool
    on, no mesh) so host work overlaps the second batch's solve;
    explicit widths / synchronous pipeline / mesh runs are untouched."""
    from chsimpy_tpu.experiment import _auto_batch_width
    ep = ExperimentParams()           # host_procs = -1 (pool on)
    assert _auto_batch_width(16, ep, None) == 8
    assert _auto_batch_width(9, ep, None) == 5
    assert _auto_batch_width(7, ep, None) == 7    # below the threshold
    ep.host_procs = 1                 # synchronous: nothing to overlap
    assert _auto_batch_width(16, ep, None) == 16
    ep.host_procs = -1
    assert _auto_batch_width(16, ep, object()) == 16  # mesh: ens axis


def test_experiment_auto_split_matches_single_batch(tmp_path, monkeypatch):
    """The auto two-batch split produces exactly the rows and files of a
    single-batch run (members are vmap-independent; row order is run-id
    order either way)."""
    import filecmp

    def run(sub, procs):
        d = tmp_path / sub
        d.mkdir()
        monkeypatch.chdir(d)
        p = base_params(N=32, ntmax=20)
        p.file_id = 'asplit'
        p.yaml = True
        p.export_csv = 'E2'
        p.compress_csv = False
        ep = ExperimentParams()
        ep.runs = 8
        ep.A_seed = 85972
        ep.processes = procs
        ep.host_procs = 2
        return run_experiment_batch(p, ep, progress=False), d

    rows_auto, d_auto = run('auto', -1)   # -> widths 4 + 4
    rows_one, d_one = run('one', 8)       # -> one width-8 batch
    assert len(rows_auto) == 8
    for a, b in zip(rows_one, rows_auto):
        assert a == b
    for r in range(8):
        fa = d_one / f'asplit-run{r}.solution.E2.csv'
        fb = d_auto / f'asplit-run{r}.solution.E2.csv'
        assert fa.exists() and fb.exists()
        assert filecmp.cmp(str(fa), str(fb), shallow=False)


def test_f64_batch_width_clamp(monkeypatch):
    """float64 ozaki ensembles on TPU run four-wide device batches (the
    chip backend miscompiles/serializes batched transforms at >= 8)."""
    import jax

    from chsimpy_tpu.experiment import _resolve_batch_width
    p = base_params(N=512)
    p.precision = 'float64'
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    assert _resolve_batch_width(16, p) == 4
    assert _resolve_batch_width(3, p) == 3
    p.precision = 'float32'
    assert _resolve_batch_width(16, p) == 16
    monkeypatch.setattr(jax, 'default_backend', lambda: 'cpu')
    p.precision = 'float64'
    assert _resolve_batch_width(16, p) == 16  # CPU ozaki is exact+fast


def test_host_pipeline_propagates_worker_errors(tmp_path, monkeypatch):
    """A failing member task surfaces at drain() with the original
    exception type, and the pool shuts down cleanly."""
    monkeypatch.chdir(tmp_path)
    import pytest

    from chsimpy_tpu.experiment import HostPipeline
    from chsimpy_tpu.solution import Solution

    p = base_params(N=16)
    p.yaml = False
    p.export_csv = 'nope_not_an_array'
    p.png = False
    sink = HostPipeline(2)
    sol = Solution(p)
    sol.U = np.zeros((16, 16))
    # postprocess needs sol.E2 via timedata; leave timedata None so the
    # worker raises (AttributeError -> surfaces at drain)
    sink.submit(p, sol, 0, 1.0, 1.0)
    with pytest.raises(Exception):
        sink.drain()
    sink.close()


def test_ensemble_wires_fwd_precision_resolver():
    """EnsembleSolver resolves the asymmetric forward precision exactly
    like the single-run solver (f32 + split + N>=2048 + unpinned)."""
    import jax

    p = base_params(N=2048, ntmax=4)
    p.precision = 'float32'
    ens = EnsembleSolver(p, a_pairs(p, [(1.0, 1.0), (1.001, 0.999)]))
    assert ens.cfg.fwd_matmul_precision == 'default'
    assert ens.cfg.fwd_mm_precision == jax.lax.Precision.DEFAULT
    assert ens.cfg.mm_precision == jax.lax.Precision.HIGH
