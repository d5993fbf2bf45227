"""Checkpoint/resume: a run interrupted at step k and resumed from disk must
reproduce the uninterrupted run bit-for-bit (the spectral image is recomputed
from U at every solve entry, so a checkpoint boundary == a resume boundary)."""

import jax
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


def test_ensemble_checkpoint_simplex_jitter_resume(tmp_path):
    """Static-jitter (simplex) ensembles restore: restore_ensemble passes
    an explicit U_init (generator=None at construction) and installs the
    saved stream afterwards — the static jitter buffer must be drawn
    lazily, not in __init__ (round-2 advisor finding)."""
    from chsimpy_tpu import material
    from chsimpy_tpu.checkpoint import (restore_ensemble,
                                        save_ensemble_checkpoint)
    from chsimpy_tpu.ensemble import EnsembleSolver

    def params():
        p = ct.Parameters()
        p.N = 32
        p.ntmax = 24
        p.no_gui = True
        p.full_sim = True
        p.generator = 'simplex'
        p.jitter = 0.01  # simplex jitter -> 'static' mode
        p.kappa_tilde = 2.98911291966116e-4
        return p

    A0 = material.A0(923.15)
    A1 = material.A1(923.15)
    pairs = np.array([[A0, A1], [A0 * 1.004, A1 * 0.997]])

    full = EnsembleSolver(params(), pairs)
    full.prepare()
    full.solve_or_resume(12)
    sols_full = full.solve_or_resume(12)

    part = EnsembleSolver(params(), pairs)
    part.prepare()
    part.solve_or_resume(12)
    f = tmp_path / 'ens-simplex.ckpt.npz'
    save_ensemble_checkpoint(str(f), part)

    resumed = restore_ensemble(str(f))  # crashed pre-fix (generator=None)
    sols_res = resumed.solve_or_resume(12)

    for a, b in zip(sols_full, sols_res):
        assert a.computed_steps == b.computed_steps
        np.testing.assert_array_equal(np.asarray(a.U), np.asarray(b.U))
        np.testing.assert_array_equal(a.timedata.data(), b.timedata.data())


def test_ensemble_checkpoint_restores_onto_different_mesh(tmp_path):
    """A checkpoint written by an UNSHARDED ensemble run restores onto an
    8-device ('ens','x','y') mesh — and vice versa: the on-disk format is
    mesh-free host state, so elastic restarts (different slice shape
    after a failure) work.  The state HANDOFF is bit-exact; the forward
    trajectory then agrees to reduction-order ULPs (the grid-sharded
    stats psum in a different order than the single-device reduce —
    measured ~5e-16 relative over 12 steps at N=32)."""
    from chsimpy_tpu import material
    from chsimpy_tpu.checkpoint import (restore_ensemble,
                                        save_ensemble_checkpoint)
    from chsimpy_tpu.ensemble import EnsembleSolver
    from chsimpy_tpu.parallel.mesh import make_ensemble_mesh

    def params():
        p = ct.Parameters()
        p.N = 32
        p.ntmax = 24
        p.no_gui = True
        p.full_sim = True
        p.generator = 'uniform'
        p.jitter = 0.01
        p.kappa_tilde = 2.98911291966116e-4
        return p

    A0 = material.A0(923.15)
    A1 = material.A1(923.15)
    pairs = np.array([[A0, A1], [A0 * 1.004, A1 * 0.997]])

    full = EnsembleSolver(params(), pairs)  # unsharded throughout
    full.prepare()
    full.solve_or_resume(12)
    sols_full = full.solve_or_resume(12)

    part = EnsembleSolver(params(), pairs)
    part.prepare()
    part.solve_or_resume(12)
    f = tmp_path / 'ens-mesh.ckpt.npz'
    save_ensemble_checkpoint(str(f), part)

    # restore onto a mesh the checkpoint never saw; the handoff itself is
    # bit-exact (restored device state == saved host state)
    mesh = make_ensemble_mesh(2, (2, 2))
    resumed = restore_ensemble(str(f), mesh=mesh)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(resumed._states.U)),
        np.asarray(jax.device_get(part._states.U)))
    sols_res = resumed.solve_or_resume(12)

    for a, b in zip(sols_full, sols_res):
        assert a.computed_steps == b.computed_steps
        np.testing.assert_allclose(np.asarray(a.U), np.asarray(b.U),
                                   rtol=1e-12)
        np.testing.assert_allclose(a.timedata.data(), b.timedata.data(),
                                   rtol=1e-12)

    # round 2: checkpoint the SHARDED run and restore unsharded — the
    # handoff is again exact (same trajectory as `resumed` continued)
    f2 = tmp_path / 'ens-mesh2.ckpt.npz'
    save_ensemble_checkpoint(str(f2), resumed)
    back = restore_ensemble(str(f2))  # no mesh
    for a, b in zip(sols_res, back.solutions()):
        np.testing.assert_array_equal(np.asarray(a.U), np.asarray(b.U))


def test_generator_state_roundtrip_midstream():
    """FieldGenerator.state_dict/from_state continues the exact stream —
    the structured replacement for the old pickle blob must be bit-exact
    for every stream-bearing kind."""
    import json

    from chsimpy_tpu.rng import FieldGenerator

    for kind in ('uniform', 'sobol', 'simplex'):
        if kind == 'sobol':
            try:
                import scipy  # noqa: F401
            except ImportError:
                continue
        g = FieldGenerator(kind, 16, seed=2008)
        g.next_sample()
        g.next_sample()  # advance mid-stream
        # must survive a JSON round trip (it is stored in the npz header)
        st = json.loads(json.dumps(g.state_dict()))
        g2 = FieldGenerator.from_state(st)
        np.testing.assert_array_equal(g.next_sample(), g2.next_sample())
        np.testing.assert_array_equal(g.next_sample(), g2.next_sample())


def test_checkpoint_file_has_no_pickle(tmp_path):
    """The on-disk format must be loadable with allow_pickle=False and the
    checkpoint module must not import pickle (restore executes no code
    from the file)."""
    import chsimpy_tpu.checkpoint as ckpt_mod

    p = params(N=16, generator='uniform', jitter=0.01)
    s = ct.Solver(p)
    s.prepare()
    s.solve_or_resume(5)
    f = str(tmp_path / 'np.npz')
    save_checkpoint(f, s)
    z = np.load(f, allow_pickle=False)  # raises if any array needs pickle
    assert 'generator' not in z.files   # v1's pickle blob field is gone
    assert not hasattr(ckpt_mod, 'pickle')


def test_cli_checkpoint_restore_flow(tmp_path):
    """The CLI surface: --checkpoint-file saves at end of run, --restore
    continues the exact trajectory with run-control flags from the new
    command line (physics params come from the checkpoint)."""
    from chsimpy_tpu.cli import CLIParser
    from chsimpy_tpu.simulator import Simulator

    f = str(tmp_path / 'run.ckpt.npz')
    base = ['-N', '32', '--no-gui', '--update-every', '5',
            '--full-sim', '-g', 'lcg', '--seed', '2023']

    # uninterrupted: 40 steps with an entry boundary at 20
    p_ref = CLIParser().get_parameters(base + ['-n', '20'])
    p_ref.kappa_tilde = 2.98911291966116e-4
    p_ref.update_every = None
    sim_ref = Simulator(p_ref)
    sim_ref.solve()
    sim_ref.solver.solve_or_resume(20)
    ref = sim_ref.solver.solution

    # interrupted: 20 steps + checkpoint, then --restore for 20 more
    p1 = CLIParser().get_parameters(
        base + ['-n', '20', '--checkpoint-file', f])
    p1.kappa_tilde = 2.98911291966116e-4
    p1.update_every = None
    Simulator(p1).solve()

    p2 = CLIParser().get_parameters(
        ['--restore', f, '-n', '20', '--no-gui'])
    p2.update_every = None
    sim2 = Simulator(p2)
    # physics came from the checkpoint, not the second command line
    assert sim2.params.N == 32
    assert sim2.params.generator == 'lcg'
    sol = sim2.solve()

    assert sol.computed_steps == ref.computed_steps
    np.testing.assert_array_equal(np.asarray(sol.U), np.asarray(ref.U))
    np.testing.assert_array_equal(sol.timedata.data(), ref.timedata.data())


def test_checkpoint_every_saves_periodically(tmp_path):
    """--checkpoint-every snapshots at chunk boundaries; the last
    periodic snapshot is itself a valid resume point."""
    f = str(tmp_path / 'periodic.ckpt.npz')
    p = params(N=16, ntmax=30, generator='uniform')
    p.chunk_size = 10
    p.checkpoint_file = f
    p.checkpoint_every = 10
    s = ct.Solver(p)
    s.prepare()
    s.solve_or_resume(30)
    # periodic save happened before the run ended (file exists and holds
    # an intermediate step count <= 30)
    s2 = restore_solver(f)
    assert 0 < s2.solution.computed_steps <= 30


def test_checkpoint_every_fires_across_reentries(tmp_path):
    """The live-view driver calls solve_or_resume once per update_every
    slice (simulator chunk loop).  The save cadence must persist across
    those entries: with slices smaller than checkpoint_every, snapshots
    still fire once enough steps accumulate (regression: last_saved was
    reset at every entry, so periodic saves never fired in live mode)."""
    f = str(tmp_path / 'reentrant.ckpt.npz')
    p = params(N=16, ntmax=40, generator='uniform')
    p.chunk_size = 5
    p.checkpoint_file = f
    p.checkpoint_every = 12
    s = ct.Solver(p)
    s.prepare()
    # live-view style: many small re-entries, each below checkpoint_every
    for _ in range(8):
        s.solve_or_resume(5)
    s2 = restore_solver(f)
    # saves fired mid-run at accumulated-step boundaries, not only at end
    assert 0 < s2.solution.computed_steps < 40


def test_checkpoint_stale_mode_fails_loudly(tmp_path):
    """A checkpoint carrying a mode this build no longer provides (e.g.
    round-2's kernel_backend='pallas-fused', deleted in round 3) must
    raise on load instead of silently restoring onto a different compute
    path (ADVICE r3)."""
    import json

    import pytest

    p = params(N=16)
    s = ct.Solver(p)
    s.prepare()
    s.solve_or_resume(5)
    f = str(tmp_path / 'stale.npz')
    save_checkpoint(f, s)

    # rewrite the header with the deleted mode
    z = np.load(f, allow_pickle=False)
    header = json.loads(bytes(z['header']).decode())
    header['params']['kernel_backend'] = 'pallas-fused'
    arrays = {k: z[k] for k in z.files}
    arrays['header'] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(f, **arrays)

    with pytest.raises(ValueError, match='pallas-fused'):
        restore_solver(f)

    header['params']['kernel_backend'] = 'xla'
    header['params']['transform_backend'] = 'warp-drive'
    arrays['header'] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(f, **arrays)
    with pytest.raises(ValueError, match='warp-drive'):
        restore_solver(f)


def test_checkpoint_extensionless_name_roundtrips(tmp_path):
    """--checkpoint-file run.ckpt must produce exactly run.ckpt (numpy
    used to append '.npz' silently, so --restore run.ckpt failed)."""
    p = params(ntmax=6, kappa_tilde=2.98911291966116e-4)
    s = ct.Solver(p)
    s.prepare()
    s.solve_or_resume(6)
    f = tmp_path / 'run.ckpt'
    save_checkpoint(str(f), s)
    assert f.exists()
    assert not (tmp_path / 'run.ckpt.npz').exists()
    s2 = restore_solver(str(f))
    assert s2.solution.computed_steps == s.solution.computed_steps


def test_checkpoint_write_is_atomic(tmp_path, monkeypatch):
    """A crash mid-write (the scenario checkpoints exist for) must leave
    the PREVIOUS checkpoint intact — saves go through a temp file +
    rename."""
    import chsimpy_tpu.checkpoint as ckpt
    p = params(ntmax=6, kappa_tilde=2.98911291966116e-4)
    s = ct.Solver(p)
    s.prepare()
    s.solve_or_resume(6)
    f = tmp_path / 'run.ckpt'
    save_checkpoint(str(f), s)
    n1 = s.solution.computed_steps
    good = f.read_bytes()

    real = np.savez_compressed

    def dies_midway(fobj, **arrays):
        real(fobj, **arrays)   # bytes hit the TEMP file...
        raise KeyboardInterrupt('simulated kill during checkpoint save')

    monkeypatch.setattr(np, 'savez_compressed', dies_midway)
    s.solve_or_resume(3)
    try:
        save_checkpoint(str(f), s)
    except KeyboardInterrupt:
        pass
    monkeypatch.setattr(np, 'savez_compressed', real)
    assert f.read_bytes() == good          # previous checkpoint intact
    assert list(tmp_path.glob('*.tmp.*')) == []   # temp cleaned up
    s2 = restore_solver(str(f))
    assert s2.solution.computed_steps == n1
