"""Ozaki int8-slice f64 transform (ops/ozaki.py): exactness of the slice /
renormalize machinery, transform accuracy vs scipy, and solver-trajectory
equivalence with the matmul route.  All on the CPU backend — int8 dots are
exact on every backend, so CPU pins the same arithmetic the TPU runs."""

import numpy as np
import pytest
import scipy.fftpack

import jax.numpy as jnp

import chsimpy_tpu as ct
from chsimpy_tpu.ops import dct as dct_ops
from chsimpy_tpu.ops import ozaki


def test_slice_matrix_host_exact():
    C = dct_ops._dct_matrix_np(64)
    slices, scale = ozaki.slice_matrix_host(C)
    rec = sum(s.astype(np.float64) * 2.0 ** (-7 * (k + 1))
              for k, s in enumerate(slices)) * scale
    # 8 slices = 56 bits from the scale top; C entries are O(scale/4)
    assert np.max(np.abs(rec - C)) <= 2.0 ** -56 * scale
    assert all(np.abs(s).max() <= 64 for s in slices)


def test_slice_field_roundtrip():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((128, 128)) - 0.5, jnp.float64)
    sl, scale = ozaki.slice_field(x)
    sl = np.asarray(sl).astype(np.float64)
    rec = sum(sl[k] * 2.0 ** (-7 * (k + 1)) for k in range(sl.shape[0]))
    rec = rec * float(scale)
    # hi/lo-f32 capture: >= 48 bits on a true-f64 host (the TPU's
    # double-single holds ~49, fully captured there)
    np.testing.assert_allclose(rec, np.asarray(x), rtol=0, atol=2.0 ** -49)
    assert np.abs(sl).max() <= 127


def test_slice_field_zero_field():
    sl, scale = ozaki.slice_field(jnp.zeros((16, 16), jnp.float64))
    assert np.all(np.asarray(sl) == 0)
    assert np.isfinite(float(scale)) and float(scale) > 0


def test_renorm_exact():
    """Carry renormalization preserves the value bit-for-bit (checked in
    exact integer arithmetic via Fractions)."""
    from fractions import Fraction
    rng = np.random.default_rng(3)
    # magnitudes representative of stage-1 groups (up to ~2e8)
    groups = [jnp.asarray(rng.integers(-2 * 10**8, 2 * 10**8, (4, 4)),
                          jnp.int32) for _ in range(8)]
    # scale down high groups so the value fits the t-slice capacity the
    # transform guarantees (|V * 2^-14| < 0.25)
    groups[0] = groups[0] // (1 << 14)
    t = np.asarray(ozaki._renorm_to_slices(groups, n_slices=12)
                   ).astype(np.int64)
    for idx in np.ndindex(4, 4):
        v = sum(Fraction(int(np.asarray(g)[idx]), 128 ** (k + 2))
                for k, g in enumerate(groups))
        w = sum(Fraction(int(t[j][idx]), 128 ** (j + 1))
                for j in range(12))
        assert v * Fraction(1, 2 ** 14) == w, idx


@pytest.mark.parametrize('N', [64, 129, 256])
def test_dct2_ozaki_matches_scipy(N):
    rng = np.random.default_rng(N)
    U = rng.random((N, N)) - 0.5
    Cs, CsT, sc = ozaki.dct_slices(N)
    got = np.asarray(ozaki.dct2_ozaki(jnp.asarray(U), Cs, CsT, sc))
    ref = scipy.fftpack.dctn(U, norm='ortho')
    den = np.max(np.abs(ref))
    # zero-mean operands are the route's worst case (the DC-split buys
    # nothing): the (5, 7) pass cutoffs set the floor, ~1.3e-11 measured
    # at N=256 (see the cutoff sweep note in ops/ozaki.py) — still three
    # orders inside the 1e-10 validation contract
    assert np.max(np.abs(got - ref)) / den < 4e-11


@pytest.mark.parametrize('N', [64, 256])
def test_dct2_ozaki_dc_dominated(N):
    """Solver-class operands (mean >> fluctuation, like U ~ 0.875 +- 1%
    and the spectral hat_U) ride the analytic DC-split: the int8 path
    only sees the fluctuation, so the relative error lands near the f64
    representation floor, ~100x below the zero-mean worst case."""
    rng = np.random.default_rng(N)
    U = 0.875 * (1.0 + 0.01 * (rng.random((N, N)) - 0.5))
    Cs, CsT, sc = ozaki.dct_slices(N)
    got = np.asarray(ozaki.dct2_ozaki(jnp.asarray(U), Cs, CsT, sc))
    ref = scipy.fftpack.dctn(U, norm='ortho')
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-15
    back = np.asarray(ozaki.idct2_ozaki(jnp.asarray(got), Cs, CsT, sc))
    # the roundtrip re-slices the spectral image, whose fluctuation part
    # is zero-mean — the (5, 7) cutoffs put it at ~1.3e-13 relative
    assert np.max(np.abs(back - U)) / np.max(np.abs(U)) < 5e-13


@pytest.mark.parametrize('N', [64, 256])
def test_idct2_ozaki_roundtrip(N):
    rng = np.random.default_rng(N + 1)
    U = rng.random((N, N))
    Cs, CsT, sc = ozaki.dct_slices(N)
    X = ozaki.dct2_ozaki(jnp.asarray(U), Cs, CsT, sc)
    back = np.asarray(ozaki.idct2_ozaki(X, Cs, CsT, sc))
    # two chained transforms on a U with a large DC component (mean ~0.5):
    # ~1.7e-11 absolute at N=256 under the (5, 7) pass cutoffs
    np.testing.assert_allclose(back, U, rtol=0, atol=5e-11)
    # and against scipy's inverse
    ref = scipy.fftpack.idctn(np.asarray(X), norm='ortho')
    np.testing.assert_allclose(np.asarray(back), ref, rtol=0, atol=5e-11)


def _run(tb, adaptive=False):
    p = ct.Parameters()
    p.N = 64
    p.ntmax = 250
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.adaptive_time = adaptive
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4
    p.precision = 'float64'
    p.transform_backend = tb
    sol = ct.Simulator(p).solve()
    return np.asarray(sol.timedata.data())


def test_solver_trajectory_matches_matmul():
    """The full 250-step f64 trajectory through the ozaki route stays
    within the validation contract (<=1e-10 relative in E) of the matmul
    route — transform error ~1e-15 does not amplify."""
    ta = _run('matmul')
    tb = _run('ozaki')
    np.testing.assert_allclose(ta[:, 1], tb[:, 1], rtol=1e-12)  # E
    # E2 (gradient-quadratic, 1st-order in U error) carries the default
    # forward trim's ~1e-9 class; E (variational, 2nd-order) does not
    np.testing.assert_allclose(ta[:, 2], tb[:, 2], rtol=1e-8)   # E2
    np.testing.assert_allclose(ta[:, 3], tb[:, 3], rtol=0, atol=1e-9)  # SA


def test_solver_trajectory_adaptive():
    ta = _run('matmul', adaptive=True)
    tb = _run('ozaki', adaptive=True)
    np.testing.assert_allclose(ta[:, 1], tb[:, 1], rtol=1e-10)  # E
    np.testing.assert_allclose(ta[:, 8], tb[:, 8], rtol=1e-7)   # delt


@pytest.mark.parametrize('N', [32, 64, 256])
def test_dct2_ozaki_fold_matches_unfolded(N):
    """The level-1 folded transforms stay in the unfolded route's accuracy
    class on both operand classes (the e/o int32 bridges are exact; only
    the f64 row fold and per-branch slice scales differ)."""
    rng = np.random.default_rng(N)
    Cs, CsT, sc = ozaki.dct_slices(N)
    fs = ozaki.dct_fold_slices(N)
    for field in (0.875 + 0.01 * (rng.random((N, N)) - 0.5),
                  rng.standard_normal((N, N))):
        x = jnp.asarray(field, jnp.float64)
        y0 = ozaki.dct2_ozaki(x, Cs, CsT, sc)
        y1 = ozaki.dct2_ozaki_fold(x, fs)
        ref = scipy.fftpack.dctn(np.asarray(x), norm='ortho')
        e0 = float(np.max(np.abs(np.asarray(y0) - ref)))
        e1 = float(np.max(np.abs(np.asarray(y1) - ref)))
        assert e1 <= 4.0 * max(e0, 1e-16), (e1, e0)
        u1 = np.asarray(ozaki.idct2_ozaki_fold(y1, fs))
        u0 = np.asarray(ozaki.idct2_ozaki(y0, Cs, CsT, sc))
        r0 = float(np.max(np.abs(u0 - field)))
        r1 = float(np.max(np.abs(u1 - field)))
        assert r1 <= 4.0 * max(r0, 1e-16), (r1, r0)


def test_ozaki_fold_resolution():
    """ozaki_fold is the single-device default and stays OFF under a grid
    mesh (the sharded route keeps the GSPMD-partitioned unfolded dots).
    Trajectory equivalence folded-vs-unfolded is pinned by
    test_sharding.py::test_sharded_ozaki_matches_single_device (the
    single-device side folds, the sharded side does not)."""
    from chsimpy_tpu.core.solver import Solver

    p = ct.Parameters()
    p.N = 32
    p.no_gui = True
    p.precision = 'float64'
    p.transform_backend = 'ozaki'
    p.kappa_tilde = 3e-4
    assert Solver(p).cfg.ozaki_fold
    p.mesh_shape = (2, 2)  # 8 virtual devices in conftest
    assert not Solver(p).cfg.ozaki_fold


def test_ozaki_rejects_float32():
    p = ct.Parameters()
    p.precision = 'float32'
    p.transform_backend = 'ozaki'
    with pytest.raises(ValueError, match='float64'):
        ct.core.solver.resolve_transform(p)


def test_ozaki_allowed_under_mesh():
    # round 2.7: the int8 pair dots shard like the matmul contraction
    # (equivalence pinned by test_sharding.py::
    # test_sharded_ozaki_matches_single_device)
    p = ct.Parameters()
    p.transform_backend = 'ozaki'
    p.mesh_shape = (2, 2)
    assert ct.core.solver.resolve_transform(p) == 'ozaki'


def test_slice_field_pallas_matches_xla():
    """The fused Pallas slice kernel (interpret mode on CPU) emits the
    exact same int8 slices and scale as the XLA chain."""
    rng = np.random.default_rng(11)
    for field in (rng.random((64, 64)) - 0.5,
                  0.875 + 0.01 * (rng.random((64, 64)) - 0.5),
                  np.zeros((16, 16))):
        x = jnp.asarray(field, jnp.float64)
        sa, sca = ozaki.slice_field(x)
        sb, scb = ozaki.slice_field_pallas(x)
        assert float(sca) == float(scb)
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


def test_transform_pallas_slice_matches():
    """dct2/idct2 with pallas_slice=True reproduce the XLA-sliced route
    bit-for-bit (same int8 slices -> same exact dots)."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(0.875 + 0.01 * (rng.random((64, 64)) - 0.5),
                    jnp.float64)
    Cs, CsT, sc = ozaki.dct_slices(64)
    ya = ozaki.dct2_ozaki(x, Cs, CsT, sc)
    yb = ozaki.dct2_ozaki(x, Cs, CsT, sc, pallas_slice=True)
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
    ua = ozaki.idct2_ozaki(ya, Cs, CsT, sc)
    ub = ozaki.idct2_ozaki(ya, Cs, CsT, sc, pallas_slice=True)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))


def test_fused_groups_bitmatch():
    """The multi-contraction group dots produce bit-identical transforms:
    same exact int8 products, same int32 accumulation."""
    rng = np.random.default_rng(13)
    x = jnp.asarray(0.875 + 0.01 * (rng.random((96, 96)) - 0.5),
                    jnp.float64)
    Cs, CsT, sc = ozaki.dct_slices(96)
    ya = ozaki.dct2_ozaki(x, Cs, CsT, sc)
    yb = ozaki.dct2_ozaki(x, Cs, CsT, sc, fused_groups=True)
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
    ua = ozaki.idct2_ozaki(ya, Cs, CsT, sc)
    ub = ozaki.idct2_ozaki(ya, Cs, CsT, sc, fused_groups=True)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))


def test_pair_groups_fused_matches_loop():
    """Fused vs pairwise group sums on asymmetric slice counts (the
    stage-2 shape, where the pairwise loop once indexed past the b
    stack)."""
    rng = np.random.default_rng(14)
    a = jnp.asarray(rng.integers(-64, 65, (10, 32, 32)), jnp.int8)
    b = jnp.asarray(rng.integers(-64, 65, (8, 32, 32)), jnp.int8)
    ga = ozaki._pair_groups(a, b, ozaki._dot_right,
                            max_pair=ozaki.STAGE2_PAIR)
    gb = ozaki._pair_groups_fused(a, b, max_pair=ozaki.STAGE2_PAIR)
    assert len(ga) == len(gb)
    for x, y in zip(ga, gb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_trimmed_slice_emission_is_prefix():
    """The (5, 7) cutoffs let the transforms emit only the slice indices
    any pair dot consumes; the chain is sequential, so a shorter emission
    must be exactly the prefix of the full one (bit-identical dots)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((32, 32)))
    full, s_full = ozaki.slice_field(x, n_slices=8)
    trim, s_trim = ozaki.slice_field(x, n_slices=6)
    assert float(s_full) == float(s_trim)
    np.testing.assert_array_equal(np.asarray(full[:6]), np.asarray(trim))
    # renorm slots are carry-computed most-significant-first: dropping the
    # deepest slots leaves the kept ones unchanged
    groups = [jnp.asarray(rng.integers(-10000, 10000, (4, 4)), jnp.int32)
              for _ in range(6)]
    t10 = np.asarray(ozaki._renorm_to_slices(groups, n_slices=10))
    t8 = np.asarray(ozaki._renorm_to_slices(groups, n_slices=8))
    np.testing.assert_array_equal(t10[:8], t8)


@pytest.mark.parametrize('N,L', [(64, 1), (64, 3), (128, 2), (256, 3)])
def test_dct2_ozaki_rfold_matches_scipy_permuted(N, L):
    """Recursive folded route (permuted basis): forward equals the
    permuted scipy spectrum at the f64 floor; roundtrip exact; 20
    chained roundtrips stay in the (5,7)-cutoff contract class."""
    from scipy.fft import dctn

    from chsimpy_tpu.ops.dct import _split_permutation_np

    rng = np.random.default_rng(11)
    x = 0.875 * (1 + 0.01 * (rng.random((N, N)) - 0.5))  # solver-class
    xj = jnp.asarray(x)
    rf, sc = ozaki.dct_rfold_slices(N, L)
    Y = np.asarray(ozaki.dct2_ozaki_rfold(xj, rf, sc, L))
    perm = _split_permutation_np(N, L)
    ref = dctn(x, norm='ortho')[np.ix_(perm, perm)]
    np.testing.assert_allclose(Y, ref, rtol=0,
                               atol=2e-15 * np.abs(ref).max())
    back = np.asarray(ozaki.idct2_ozaki_rfold(jnp.asarray(Y), rf, sc, L))
    np.testing.assert_allclose(back, x, rtol=0, atol=1e-12)
    z = xj
    for _ in range(20):
        z = ozaki.idct2_ozaki_rfold(
            ozaki.dct2_ozaki_rfold(z, rf, sc, L), rf, sc, L)
    np.testing.assert_allclose(np.asarray(z), x, rtol=0, atol=1e-11)


def test_solver_rfold_trajectory_matches_matmul():
    """At N >= 1024 the ozaki route auto-engages the recursive permuted
    fold (rfold2); the solver trajectory must stay in the ozaki accuracy
    class vs the f64 matmul route, through the permuted-leig adaptive
    machinery as well."""
    def run(tb, adaptive=False, fwd_pairs=None, inv_pairs=None):
        p = ct.Parameters()
        p.N = 1024
        p.ntmax = 4
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.transform_backend = tb
        p.adaptive_time = adaptive
        p.ozaki_fwd_pairs = fwd_pairs
        p.ozaki_inv_pairs = inv_pairs
        from chsimpy_tpu.core.solver import Solver
        s = Solver(p)
        if tb == 'ozaki':
            assert s.cfg.ozaki_rfold_levels == 2
        s.prepare()
        s.solve_or_resume(4)
        return s.solution

    a = run('matmul')
    b = run('ozaki')
    # full default trim (fwd (3, 5) + rfold inverse (3, 5)): the inverse
    # trim has no damping shield, so its ~1.3e-9/step U term dominates
    # the per-step class — the CONTRACT statistic (full-run E <= 1e-10
    # at every step + exact stops) is pinned by the golden replays, not
    # here (measured 5.6e-11 / stop 1837 at this very N)
    # (measured: U 5.3e-9, E 4.9e-15 — the trim error is spectrally
    # structured and nearly energy-neutral)
    np.testing.assert_allclose(np.asarray(b.U), np.asarray(a.U),
                               rtol=0, atol=2e-8)
    np.testing.assert_allclose(b.timedata.data()[:, 1],
                               a.timedata.data()[:, 1], rtol=1e-13)
    # inverse untrimmed: back to the damped-forward-only class
    d = run('ozaki', inv_pairs=(5, 7))
    np.testing.assert_allclose(np.asarray(d.U), np.asarray(a.U),
                               rtol=0, atol=2e-10)
    np.testing.assert_allclose(d.timedata.data()[:, 1],
                               a.timedata.data()[:, 1], rtol=1e-13)
    c = run('ozaki', fwd_pairs=(5, 7), inv_pairs=(5, 7))  # untrimmed
    np.testing.assert_allclose(np.asarray(c.U), np.asarray(a.U),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(c.timedata.data()[:, 1],
                               a.timedata.data()[:, 1], rtol=1e-12)


def test_vmapped_ozaki_emits_no_scatter():
    """Round-4 chip regression: the DC split's .at[0,0] scatter/gather
    pair miscomputed under vmap on real TPU once the forward and inverse
    fused into one program (roundtrip off by 5e-10..9e-3 — DC-scale —
    while each half alone was exact), and the batched scatter serialized
    the vmapped f64 ensemble ~40x.  The DC ops are now mask arithmetic;
    this pins that no scatter/dynamic-update-slice appears in the
    vmapped transform programs (checkable on any backend)."""
    import jax
    import jax.numpy as jnp

    N, B = 64, 3
    x = jnp.ones((B, N, N), jnp.float64) * 0.875
    Cs, CsT, sc = ozaki.dct_slices(N)
    fs = ozaki.dct_fold_slices(N)
    fsd = {k: fs[k] for k in ('CeS', 'CoS', 'CeTS', 'CoTS')}
    fsd['scale'] = fs['scale']
    rf, rsc = ozaki.dct_rfold_slices(N, 2)

    def rt_unf(u):
        return ozaki.idct2_ozaki(ozaki.dct2_ozaki(u, Cs, CsT, sc),
                                 Cs, CsT, sc)

    def rt_fold(u):
        return ozaki.idct2_ozaki_fold(ozaki.dct2_ozaki_fold(u, fsd), fsd)

    def rt_rfold(u):
        return ozaki.idct2_ozaki_rfold(
            ozaki.dct2_ozaki_rfold(u, rf, rsc, 2), rf, rsc, 2)

    for name, fn in (('unfold', rt_unf), ('fold', rt_fold),
                     ('rfold', rt_rfold)):
        hlo = jax.jit(jax.vmap(fn)).lower(x).as_text()
        assert 'scatter' not in hlo, name
        assert 'dynamic-update-slice' not in hlo, name
        assert 'dynamic_update_slice' not in hlo, name
