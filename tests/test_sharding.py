"""Grid-sharding tests on the 8-device virtual CPU mesh: the sharded solver
must reproduce the single-device results (up to collective reduction-order
rounding) and actually distribute the field."""

import jax
import numpy as np
import pytest

import chsimpy_tpu as ct
from chsimpy_tpu.parallel.mesh import best_grid_shape, make_grid_mesh


def run(mesh_shape, N=64, ntmax=40):
    p = ct.Parameters()
    p.N = N
    p.ntmax = ntmax
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.mesh_shape = mesh_shape
    sim = ct.Simulator(p)
    sol = sim.solve()
    return sol


@pytest.mark.parametrize('mesh_shape', [(2, 4), (1, 8), (2, 2)])
def test_sharded_matches_single_device(mesh_shape):
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    ref = run(None)
    sh = run(mesh_shape)
    assert sh.computed_steps == ref.computed_steps
    np.testing.assert_allclose(sh.U, ref.U, rtol=0, atol=1e-12)
    td_ref = ref.timedata.data()
    td_sh = sh.timedata.data()
    np.testing.assert_allclose(td_sh[:, 1], td_ref[:, 1], rtol=1e-12)  # E
    np.testing.assert_allclose(td_sh[:, 2], td_ref[:, 2], rtol=1e-10)  # E2


def test_field_is_actually_sharded():
    p = ct.Parameters()
    p.N = 64
    p.ntmax = 5
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.mesh_shape = (2, 4)
    sim = ct.Simulator(p)
    sim.solver.prepare()
    sim.solver.solve_or_resume(5)
    U = sim.solver._state.U
    assert len(U.sharding.device_set) == 8
    # each device holds a (32, 16) shard of the (64, 64) field
    shard_shape = U.sharding.shard_shape(U.shape)
    assert shard_shape == (32, 16)


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_grid_mesh((4, 4, 4))
    with pytest.raises(ValueError):
        make_grid_mesh((100, 100))
    assert best_grid_shape(8) == (2, 4)
    assert best_grid_shape(16) == (4, 4)
    assert best_grid_shape(7) == (1, 7)


def test_collect_collectives_parses_sync_and_async_forms():
    """The audit must count sync collectives, non-tuple async starts
    (via their -done), and tuple-shaped async starts (where the -start's
    printed shape mixes operands/results/context and is NOT parseable as
    a single token) — each exactly once, at the collective's RESULT
    bytes.  A parser miss here silently under-reports ICI traffic, which
    is the condition the audit exists to detect."""
    from chsimpy_tpu.parallel.audit import collect_collectives
    hlo = '\n'.join([
        # sync form: shape is the result
        '%ar = f32[512,512]{1,0} all-reduce(%x), replica_groups={}',
        # async pair, tuple-shaped start (operand, result): count once,
        # at the done's result shape (2048x2048 f32 = 16 MB)
        '%ag = (f32[512,2048]{1,0}, f32[2048,2048]{1,0}) '
        'all-gather-start(%y), dimensions={0}',
        '%agd = f32[2048,2048]{1,0} all-gather-done(%ag)',
        # async reduce-scatter: result is operand/D — the done carries it
        '%rs = (f32[2048,2048]{1,0}, f32[512,2048]{1,0}) '
        'reduce-scatter-start(%z), dimensions={0}',
        '%rsd = f32[512,2048]{1,0} reduce-scatter-done(%rs)',
        # collective-permute start with trailing context scalars
        '%cp = (f32[256,256]{1,0}, f32[256,256]{1,0}, u32[], u32[]) '
        'collective-permute-start(%w)',
        '%cpd = f32[256,256]{1,0} collective-permute-done(%cp)',
        # non-collective ops must not be picked up
        '%d = f32[512,512]{1,0} dot(%a, %b)',
    ])
    recs = collect_collectives(hlo)
    by_op = {r['op']: r['bytes'] for r in recs}
    assert len(recs) == 4, recs
    assert by_op['all-reduce'] == 512 * 512 * 4
    assert by_op['all-gather'] == 2048 * 2048 * 4
    assert by_op['reduce-scatter'] == 512 * 2048 * 4, (
        "reduce-scatter must be counted at its RESULT (operand/D) bytes")
    assert by_op['collective-permute'] == 256 * 256 * 4


def test_sharded_chunk_collective_audit():
    """The compiled sharded step must contract the DCT via partial-shard
    collectives: no single collective moves the full field, and the total
    per-program collective volume stays within a small multiple of one
    field (PERFORMANCE.md records the inventory)."""
    from chsimpy_tpu.parallel.audit import audit_sharded_chunk
    res = audit_sharded_chunk(N=128, mesh_shape=(2, 4),
                              precision='float32')
    assert res['n_collectives'] > 0, "sharded program has no collectives?"
    assert res['max_single_collective_bytes'] < res['field_bytes'], (
        "a collective moves the full field: silent all-gather",
        res['per_op_bytes'])
    assert res['total_bytes'] <= 8 * res['field_bytes'], res['per_op_bytes']


def test_sharded_ozaki_matches_single_device():
    """The ozaki int8 transform shards under the mesh (GSPMD partitions
    the pair dots like the matmul contraction).  int8/int32 stages are
    exact regardless of partitioning; only the DC-mean and stat
    reductions pick up collective ordering rounding.  Forward trimming
    is pinned to (5, 7) here: the single-device run takes the FOLDED
    route and the sharded one the unfolded route, which agree at the
    1e-15 exactness floor only untrimmed (the default (3, 5) trim
    rounds the two routes differently at its own ~1e-11 class — the
    same-route partitioning invariance is pinned by
    test_pencil_ozaki_matches_single_device)."""
    def run_oz(mesh_shape):
        p = ct.Parameters()
        p.N = 64
        p.ntmax = 40
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.generator = 'lcg'
        p.transform_backend = 'ozaki'
        p.ozaki_fwd_pairs = (5, 7)
        p.mesh_shape = mesh_shape
        return ct.Simulator(p).solve()

    ref = run_oz(None)
    sh = run_oz((2, 4))
    assert sh.computed_steps == ref.computed_steps
    np.testing.assert_allclose(sh.U, ref.U, rtol=0, atol=1e-12)
    np.testing.assert_allclose(sh.timedata.data()[:, 1],
                               ref.timedata.data()[:, 1], rtol=1e-12)


def test_sharded_ozaki_collective_audit():
    """Sharded ozaki moves only partial shards too: many small
    per-pair-dot collectives, never the full field in one op."""
    from chsimpy_tpu.parallel.audit import audit_sharded_chunk
    res = audit_sharded_chunk(N=128, mesh_shape=(2, 4),
                              precision='float64', transform='ozaki')
    assert res['n_collectives'] > 0
    assert res['max_single_collective_bytes'] < res['field_bytes'], (
        res['per_op_bytes'])
    # int8 slice stacks multiply the partial-move count; keep the bound
    # generous but finite (measured 7.8x at N=256)
    assert res['total_bytes'] <= 16 * res['field_bytes'], (
        res['per_op_bytes'])


# ----------------------------------------------------------------------
# Pencil (1-D) sharded split route — round 4
# ----------------------------------------------------------------------


def _pencil_params(mesh_shape, precision='float64', N=64, adaptive=False):
    p = ct.Parameters()
    p.N = N
    p.ntmax = 40
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.precision = precision
    p.transform_backend = 'split'
    p.mesh_shape = mesh_shape
    p.adaptive_time = adaptive
    p.kappa_tilde = 2.98911291966116e-4
    return p


@pytest.mark.parametrize('mesh_shape', [(1, 2), (2, 2), (2, 4)])
def test_pencil_split_bitexact_across_device_counts(mesh_shape):
    """Every matmul in the pencil route contracts a LOCAL axis, so the
    f64 U trajectory must be BIT-identical across device counts (the
    collectives are pure data movement); E agrees to psum ULPs."""
    from chsimpy_tpu.core.solver import Solver

    base = Solver(_pencil_params((1, 1)))
    assert base.cfg.pencil
    base.prepare()
    base.solve_or_resume(40)
    sh = Solver(_pencil_params(mesh_shape))
    assert sh.cfg.pencil
    sh.prepare()
    sh.solve_or_resume(40)
    np.testing.assert_array_equal(np.asarray(sh.solution.U),
                                  np.asarray(base.solution.U))
    np.testing.assert_allclose(sh.solution.timedata.data()[:, 1],
                               base.solution.timedata.data()[:, 1],
                               rtol=1e-13)


def test_pencil_split_matches_unsharded_split():
    """The pencil stage order nests the inverse's two 1-D summations the
    other way round than the single-device split route — same exact
    transform, f64 trajectory agreement to representation-class ULPs."""
    from chsimpy_tpu.core.solver import Solver

    ref = Solver(_pencil_params(None))
    assert not ref.cfg.pencil
    ref.prepare()
    ref.solve_or_resume(40)
    sh = Solver(_pencil_params((2, 4)))
    sh.prepare()
    sh.solve_or_resume(40)
    np.testing.assert_allclose(np.asarray(sh.solution.U),
                               np.asarray(ref.solution.U),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(sh.solution.timedata.data()[:, 1],
                               ref.solution.timedata.data()[:, 1],
                               rtol=1e-12)


def test_pencil_adaptive_composes():
    """Adaptive-dt under the pencil layout: the coefficient rebuild and
    the ord=-1 norm (local column sums + order-free min) must keep the
    sharded trajectory bit-identical to the 1-device pencil run."""
    from chsimpy_tpu.core.solver import Solver

    base = Solver(_pencil_params((1, 1), adaptive=True))
    base.prepare()
    base.solve_or_resume(40)
    sh = Solver(_pencil_params((2, 4), adaptive=True))
    sh.prepare()
    sh.solve_or_resume(40)
    np.testing.assert_array_equal(np.asarray(sh.solution.U),
                                  np.asarray(base.solution.U))
    np.testing.assert_array_equal(
        np.asarray(sh.solution.timedata.data()[:, 8]),
        np.asarray(base.solution.timedata.data()[:, 8]))  # delt column


def test_pencil_field_layout_and_audit():
    """The pencil program must (a) actually shard the field 1-D over all
    devices, (b) communicate via transpose all-to-alls, (c) never
    all-gather the full field, and (d) move LESS total collective volume
    than one field per step."""
    from chsimpy_tpu.core.solver import Solver
    from chsimpy_tpu.parallel.audit import audit_sharded_chunk

    p = _pencil_params((2, 4), precision='float32')
    s = Solver(p)
    s.prepare()
    s.solve_or_resume(5)
    U = s._state.U
    assert len(U.sharding.device_set) == 8
    assert U.sharding.shard_shape(U.shape) == (64, 8)      # columns
    hat = s._state.hat_U
    assert hat.sharding.shard_shape(hat.shape) == (8, 64)  # rows

    res = audit_sharded_chunk(64, (2, 4), 'float32', transform='split')
    assert res['per_op_bytes'].get('all-to-all', 0) > 0
    assert res['per_op_bytes'].get('all-gather', 0) == 0
    assert res['total_bytes'] < res['field_bytes']
    assert res['max_single_collective_bytes'] <= res['field_bytes'] // 8


def test_pencil_ensemble_matches_unsharded():
    """Grid-sharded member fields under the split route take the pencil
    layout inside the vmapped ensemble."""
    from chsimpy_tpu import material
    from chsimpy_tpu.ensemble import EnsembleSolver
    from chsimpy_tpu.parallel.mesh import make_ensemble_mesh

    p = _pencil_params(None)
    A0 = material.A0(p.temp)
    A1 = material.A1(p.temp)
    pairs = np.array([[A0 * 1.001, A1 * 0.999], [A0 * 0.999, A1 * 1.001]])

    ref = EnsembleSolver(p, pairs)
    assert not ref.cfg.pencil
    ref.prepare()
    ref_sols = ref.solve_or_resume(30)

    mesh = make_ensemble_mesh(2, (2, 2))
    sh = EnsembleSolver(_pencil_params(None), pairs, mesh=mesh)
    assert sh.cfg.pencil
    sh.prepare()
    sh_sols = sh.solve_or_resume(30)
    for a, b in zip(sh_sols, ref_sols):
        np.testing.assert_allclose(np.asarray(a.U), np.asarray(b.U),
                                   rtol=0, atol=1e-13)
        np.testing.assert_allclose(a.timedata.data()[:, 1],
                                   b.timedata.data()[:, 1], rtol=1e-12)


def test_pencil_ozaki_matches_single_device():
    """f64 ozaki under the pencil layout: exact int8/int32 stages are
    partitioning-invariant, so the sharded trajectory matches a
    1-device pencil run to DC-mean psum ULPs; the audit must show the
    slice-stack all-to-alls and no full-field all-gather."""
    from chsimpy_tpu.core.solver import Solver
    from chsimpy_tpu.parallel.audit import audit_sharded_chunk

    def run(mesh_shape):
        p = _pencil_params(mesh_shape, precision='float64')
        p.transform_backend = 'ozaki'
        s = Solver(p)
        assert s.cfg.pencil == (mesh_shape is not None)
        s.prepare()
        s.solve_or_resume(30)
        return s.solution

    base = run((1, 1))
    sh = run((2, 4))
    np.testing.assert_allclose(np.asarray(sh.U), np.asarray(base.U),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(sh.timedata.data()[:, 1],
                               base.timedata.data()[:, 1], rtol=1e-12)

    res = audit_sharded_chunk(64, (2, 4), 'float64', transform='ozaki')
    assert res['per_op_bytes'].get('all-to-all', 0) > 0
    # wire volume: the mid stacks are 8 int8 slots = one f64 field
    # equivalent per transform, two transforms per step; allow the
    # small DC/amax all-reduces on top but nothing near the grid
    # route's partial-shard gathers (7.8x the field, PERFORMANCE.md)
    assert res['total_bytes'] < 3 * res['field_bytes']


def test_ensemble_axis_is_wire_free():
    """The multi-host ensemble axis: members are independent programs
    except the vmapped while_loop's continue predicate — the audited
    cross-member traffic must be scalar-class (measured: ONE 1-byte
    all-reduce per step), so ensemble scaling is bounded by the
    stop-step straggler spread, not the wire (the committed round-4 UQ
    artifact measures that spread at mean/max = 99.2%)."""
    from chsimpy_tpu.parallel.audit import audit_ensemble_chunk

    r = audit_ensemble_chunk(64, 8, 'float32')
    assert r['total_bytes'] <= 16, r['per_op_bytes']
    assert r['per_op_bytes'].get('all-gather', 0) == 0
    assert r['per_op_bytes'].get('all-to-all', 0) == 0


def test_pencil_per_device_footprint_is_total_over_D():
    """The pencil layout's purpose is fields past one chip's HBM: every
    field-sized state leaf must hold exactly total/D bytes per device
    (the timedata row buffer stays replicated by design).  The committed
    N=8192 f64 artifact (artifacts/r5/pencil_8192_demo.json — 256
    MiB/device of a 512 MiB field, trajectory equal to unsharded at
    1e-14) runs the same probe at production size."""
    from chsimpy_tpu.core.solver import Solver

    p = _pencil_params((2, 4), precision='float64', N=256)
    s = Solver(p)
    s.prepare()
    s.solve_or_resume(2)
    st = s._state
    D = 8
    for name in ('U', 'hat_U'):
        x = getattr(st, name)
        shard = x.sharding.shard_shape(x.shape)
        assert len(x.sharding.device_set) == D
        per_dev = x.dtype.itemsize * int(np.prod(shard))
        assert per_dev * D == x.nbytes, (name, shard, x.shape)


def test_pencil_pinned_inv_band_and_otf_compose():
    """TUNING.md promises the --inv-band and --otf-coeffs PINS also work
    under a mesh (auto stays single-device): the pinned f32 pencil run
    must compile, execute, and track the unpinned pencil trajectory in
    the f32 accuracy class (the banded tail rounding and the <=1 ULP
    leig rebuild are both far under the route's own noise)."""
    from chsimpy_tpu.core.solver import Solver

    base = Solver(_pencil_params((2, 4), precision='float32'))
    assert base.cfg.pencil
    base.prepare()
    base.solve_or_resume(40)

    p = _pencil_params((2, 4), precision='float32')
    p.inv_band = 16          # N=64 -> N/4
    p.otf_coeffs = 1
    pin = Solver(p)
    assert pin.cfg.pencil
    assert pin.cfg.inv_band == 16
    assert pin.cfg.otf_coeffs
    pin.prepare()
    pin.solve_or_resume(40)
    np.testing.assert_allclose(np.asarray(pin.solution.U),
                               np.asarray(base.solution.U),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(pin.solution.timedata.data()[:, 1],
                               base.solution.timedata.data()[:, 1],
                               rtol=1e-5)
