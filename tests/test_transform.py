"""The FFT (Makhoul rFFT) DCT route: exactness vs scipy, solver-level
equivalence with the matmul route, and backend resolution rules."""

import numpy as np
import pytest

import chsimpy_tpu as ct
from chsimpy_tpu.core.solver import resolve_transform
from chsimpy_tpu.ops import dct as dct_ops

import jax.numpy as jnp


@pytest.mark.parametrize('N', [8, 64, 130, 256])
def test_fft_dct_matches_scipy(N):
    from scipy.fftpack import dctn, idctn
    x = np.random.default_rng(0).random((N, N))
    ref = dctn(x, norm='ortho')
    got = np.asarray(dct_ops.dct2_fft(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=5e-14)
    back = np.asarray(dct_ops.idct2_fft(jnp.asarray(ref)))
    np.testing.assert_allclose(back, x, rtol=0, atol=5e-14)
    # matches idctn too (DCT-III)
    np.testing.assert_allclose(back, idctn(ref, norm='ortho'),
                               rtol=0, atol=5e-14)


def test_fft_and_matmul_routes_agree_in_solver():
    """Full f64 solve with each transform backend: same trajectory to
    transform rounding (~1e-13 relative)."""
    def run(tb):
        p = ct.Parameters()
        p.N = 64
        p.ntmax = 60
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.transform_backend = tb
        sol = ct.Simulator(p).solve()
        return np.asarray(sol.timedata.data()), np.asarray(sol.U)

    ta, Ua = run('matmul')
    tb_, Ub = run('fft')
    np.testing.assert_allclose(ta[:, 1], tb_[:, 1], rtol=1e-12)   # E
    np.testing.assert_allclose(ta[:, 2], tb_[:, 2], rtol=1e-6)    # E2
    np.testing.assert_allclose(Ua, Ub, rtol=0, atol=1e-11)


def test_fft_route_golden_trace():
    """The fft route independently meets the reference-golden contract
    (E <= 1e-10 relative at every step)."""
    import json
    import os
    with open(os.path.join(os.path.dirname(__file__), 'golden',
                           'n64_lcg_200.json')) as f:
        g = json.load(f)
    p = ct.Parameters()
    p.no_gui = True
    p.update_every = None
    for k, v in g['config'].items():
        setattr(p, k, v)
    p.transform_backend = 'fft'
    sol = ct.Simulator(p).solve()
    td = sol.timedata.data()
    assert sol.computed_steps == g['computed_steps']
    np.testing.assert_allclose(td[:, 1], np.asarray(g['E']), rtol=1e-10)


def test_resolve_transform_rules():
    p = ct.Parameters()
    # f64 default: matmul (bit-level validation path)
    assert resolve_transform(p) == 'matmul'
    # f32 large grid: folded matmul (measured winner, PERFORMANCE.md)
    p.precision = 'float32'
    p.N = 4096
    assert resolve_transform(p) == 'split'
    # small grid: matmul
    p.N = 256
    assert resolve_transform(p) == 'matmul'
    # mesh + f32 large grid: split via the pencil layout (round 4)
    p.N = 4096
    p.mesh_shape = (2, 4)
    assert resolve_transform(p) == 'split'
    # ... unless the grid does not divide the device count
    p.N = 1028
    assert resolve_transform(p) == 'matmul'
    # ... or the kernels are the Pallas grid stencils
    p.N = 4096
    p.kernel_backend = 'pallas'
    assert resolve_transform(p) == 'matmul'
    # explicit split + mesh + pallas is rejected
    p.transform_backend = 'split'
    with pytest.raises(ValueError, match='pallas|kernels'):
        resolve_transform(p)
    p.kernel_backend = 'xla'
    # explicit split + mesh needs N divisible by the device count
    p.N = 1028
    with pytest.raises(ValueError, match='divisible'):
        resolve_transform(p)
    p.N = 4096
    assert resolve_transform(p) == 'split'
    # explicit fft + mesh is rejected
    p.transform_backend = 'fft'
    with pytest.raises(ValueError, match='mesh'):
        resolve_transform(p)
    p.transform_backend = 'auto'
    # explicit choices pass through
    p.mesh_shape = None
    p.transform_backend = 'fft'
    assert resolve_transform(p) == 'fft'
    p.transform_backend = 'split'
    assert resolve_transform(p) == 'split'
    p.transform_backend = 'matmul'
    assert resolve_transform(p) == 'matmul'
    # odd N cannot fold
    p.transform_backend = 'split'
    p.N = 127
    with pytest.raises(ValueError, match='even N'):
        resolve_transform(p)


@pytest.mark.parametrize('N,levels', [(8, 1), (64, 2), (64, 3), (256, 2),
                                      (130, 1)])
def test_split_dct_matches_scipy(N, levels):
    from scipy.fftpack import dctn
    from chsimpy_tpu.ops.dct import (dct2_split, idct2_split, split_tree)
    x = np.random.default_rng(1).random((N, N))
    ref = dctn(x, norm='ortho')
    tree = split_tree(N, levels)
    got = np.asarray(dct2_split(jnp.asarray(x), tree))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)
    back = np.asarray(idct2_split(jnp.asarray(ref), tree))
    np.testing.assert_allclose(back, x, rtol=0, atol=1e-12)


def test_split_route_golden_trace():
    """The split route independently meets the reference-golden contract
    (E <= 1e-10 relative at every step) in f64."""
    import json
    import os
    with open(os.path.join(os.path.dirname(__file__), 'golden',
                           'n64_lcg_200.json')) as f:
        g = json.load(f)
    p = ct.Parameters()
    p.no_gui = True
    p.update_every = None
    for k, v in g['config'].items():
        setattr(p, k, v)
    p.transform_backend = 'split'
    sol = ct.Simulator(p).solve()
    td = sol.timedata.data()
    assert sol.computed_steps == g['computed_steps']
    np.testing.assert_allclose(td[:, 1], np.asarray(g['E']), rtol=1e-10)


def test_split_route_in_solver_f32():
    """f32 split trajectory agrees with the f32 matmul trajectory to f32
    arithmetic level (the fast-path default at N>=1024)."""
    def run(tb):
        p = ct.Parameters()
        p.N = 64
        p.ntmax = 60
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.precision = 'float32'
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.transform_backend = tb
        sol = ct.Simulator(p).solve()
        return np.asarray(sol.timedata.data()), np.asarray(sol.U)

    ta, Ua = run('matmul')
    tb_, Ub = run('split')
    np.testing.assert_allclose(ta[:, 1], tb_[:, 1], rtol=1e-5)
    np.testing.assert_allclose(Ua, Ub, rtol=0, atol=1e-4)


def test_ensemble_split_matches_matmul():
    from chsimpy_tpu import material
    from chsimpy_tpu.ensemble import EnsembleSolver

    def run(tb):
        p = ct.Parameters()
        p.N = 32
        p.ntmax = 30
        p.no_gui = True
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.transform_backend = tb
        A0 = material.A0(p.temp)
        A1 = material.A1(p.temp)
        pairs = np.array([[A0, A1], [A0 * 1.004, A1 * 0.997]])
        ens = EnsembleSolver(p, pairs)
        ens.prepare()
        return ens.solve_or_resume(p.ntmax)

    sa = run('matmul')
    sb = run('split')
    for x, y in zip(sa, sb):
        assert x.computed_steps == y.computed_steps
        np.testing.assert_allclose(np.asarray(x.U), np.asarray(y.U),
                                   rtol=0, atol=1e-11)


def test_transform_cli_flag():
    from chsimpy_tpu.cli import CLIParser
    p = CLIParser().get_parameters(['--transform', 'fft', '-N', '64'])
    assert p.transform_backend == 'fft'
    p = CLIParser().get_parameters(['-N', '64'])
    assert p.transform_backend == 'auto'


def test_ensemble_fft_matches_matmul():
    from chsimpy_tpu import material
    from chsimpy_tpu.ensemble import EnsembleSolver

    def run(tb):
        p = ct.Parameters()
        p.N = 32
        p.ntmax = 30
        p.no_gui = True
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.transform_backend = tb
        A0 = material.A0(p.temp)
        A1 = material.A1(p.temp)
        pairs = np.array([[A0, A1], [A0 * 1.004, A1 * 0.997]])
        ens = EnsembleSolver(p, pairs)
        ens.prepare()
        return ens.solve_or_resume(p.ntmax)

    sa = run('matmul')
    sb = run('fft')
    for x, y in zip(sa, sb):
        assert x.computed_steps == y.computed_steps
        np.testing.assert_allclose(np.asarray(x.U), np.asarray(y.U),
                                   rtol=0, atol=1e-11)


def test_split_route_adaptive_time():
    """Adaptive-dt mode rebuilds CHeig/Seig on device from the eigenvalue
    grid each step; under the split route that grid lives in the PERMUTED
    basis — the rebuilt coefficients must stay consistent with the
    permuted transforms (trajectory matches the matmul route)."""
    def run(tb):
        p = ct.Parameters()
        p.N = 64
        p.ntmax = 250
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.adaptive_time = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.transform_backend = tb
        sol = ct.Simulator(p).solve()
        return np.asarray(sol.timedata.data())

    ta = run('matmul')
    tb_ = run('split')
    np.testing.assert_allclose(ta[:, 1], tb_[:, 1], rtol=1e-10)   # E
    np.testing.assert_allclose(ta[:, 8], tb_[:, 8], rtol=1e-7)    # delt


@pytest.mark.parametrize('N,levels', [(8, 1), (64, 2), (64, 4), (256, 3)])
def test_folded_split_variants_bit_match(N, levels):
    """The level-1 folded-field variants are bit-identical to the
    permuted route composed with fold1/unfold1 — the fold is pure data
    layout, every add/sub/matmul runs on the same values in the same
    order (the round-3 reversal-elimination headroom candidate)."""
    from chsimpy_tpu.ops.dct import (dct2_split_perm, idct2_split_perm,
                                     dct2_split_perm_folded,
                                     idct2_split_perm_folded,
                                     fold1, unfold1, split_tree)
    x = np.random.default_rng(7).random((N, N))
    xj = jnp.asarray(x)
    tree = split_tree(N, levels)

    # fold1 is an involution
    np.testing.assert_array_equal(np.asarray(unfold1(fold1(xj))), x)

    X_nat = np.asarray(dct2_split_perm(xj, tree))
    X_fold = np.asarray(dct2_split_perm_folded(fold1(xj), tree))
    np.testing.assert_array_equal(X_fold, X_nat)

    U_nat = np.asarray(idct2_split_perm(jnp.asarray(X_nat), tree))
    U_fold = np.asarray(idct2_split_perm_folded(jnp.asarray(X_nat), tree))
    np.testing.assert_array_equal(U_fold, np.asarray(fold1(jnp.asarray(U_nat))))
    # roundtrip identity in the folded layout
    np.testing.assert_allclose(
        np.asarray(idct2_split_perm_folded(
            jnp.asarray(X_fold), tree)),
        np.asarray(fold1(xj)), rtol=0, atol=1e-12)


def test_fold_field_solver_bit_matches_natural():
    """--fold-field changes only the data layout between transforms: the
    U trajectory must be BIT-identical to the natural split run (stats
    never feed the field update), the trace equal to reduction-order
    ULPs, and solution.U/checkpoints must present the natural view."""
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    def params(fold):
        p = ct.Parameters()
        p.N = 64
        p.ntmax = 40
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.generator = 'uniform'
        p.jitter = 0.01  # stream jitter: the slab fold must land the
        p.seed = 2023    # same values on the same original cells
        p.transform_backend = 'split'
        p.kappa_tilde = 2.98911291966116e-4
        p.fold_field = fold
        return p

    nat = Solver(params(False))
    nat.prepare()
    nat.solve_or_resume(40)
    fol = Solver(params(True))
    fol.prepare()
    fol.solve_or_resume(40)

    assert fol.solution.computed_steps == nat.solution.computed_steps
    # field trajectory: bit-identical (pure layout change)
    np.testing.assert_array_equal(np.asarray(fol.solution.U),
                                  np.asarray(nat.solution.U))
    # trace: the folded stats regroup slice sums (and the natural CPU-f64
    # run uses the reference-order _stats), so ULP-order shifts only
    np.testing.assert_allclose(fol.solution.timedata.data(),
                               nat.solution.timedata.data(),
                               rtol=1e-12, atol=1e-13)


def test_fold_field_adaptive_bit_matches_natural():
    """--fold-field composes with --adaptive: delt feeds the field
    update, so the adaptive ord=-1 norm must be BIT-identical under the
    folded layout.  The stepper un-reverses the bottom-half rows of the
    norm operand (columns may stay relabeled — min over columns is
    order-free), so every column sum runs over the natural row order.
    Runs past step 500 so the adaptation actually fires."""
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    def run(fold):
        p = ct.Parameters()
        p.N = 32
        p.ntmax = 560
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.adaptive_time = True
        p.generator = 'lcg'
        p.transform_backend = 'split'
        p.kappa_tilde = 2.98911291966116e-4
        p.fold_field = fold
        s = Solver(p)
        s.prepare()
        s.solve_or_resume(560)
        return s.solution

    nat = run(False)
    fol = run(True)
    delt_nat = np.asarray(nat.timedata.data())[:, 8]
    delt_fol = np.asarray(fol.timedata.data())[:, 8]
    # the adaptation actually changed delt in this config (non-vacuous)
    assert delt_nat.max() > delt_nat[0]
    # delt trajectory: bit-identical (it feeds the field update)
    np.testing.assert_array_equal(delt_fol, delt_nat)
    # and so is the field
    np.testing.assert_array_equal(np.asarray(fol.U), np.asarray(nat.U))


def test_fold_field_checkpoint_roundtrip(tmp_path):
    """Checkpoints from a folded run hold the NATURAL field on disk and
    resume bit-exactly (fold applied on restore)."""
    import chsimpy_tpu as ct
    from chsimpy_tpu.checkpoint import (load_checkpoint, restore_solver,
                                        save_checkpoint)
    from chsimpy_tpu.core.solver import Solver

    def params():
        p = ct.Parameters()
        p.N = 32
        p.ntmax = 40
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.generator = 'lcg'
        p.transform_backend = 'split'
        p.kappa_tilde = 2.98911291966116e-4
        p.fold_field = True
        return p

    ref = Solver(params())
    ref.prepare()
    ref.solve_or_resume(20)
    ref.solve_or_resume(20)

    s = Solver(params())
    s.prepare()
    s.solve_or_resume(20)
    f = str(tmp_path / 'fold.ckpt.npz')
    save_checkpoint(f, s)

    # on-disk U is the natural view (matches the natural-mode solver)
    _, payload = load_checkpoint(f)
    np.testing.assert_array_equal(payload['U'], np.asarray(s.solution.U))

    s2 = restore_solver(f)
    assert s2.cfg.fold_field
    s2.solve_or_resume(20)
    np.testing.assert_array_equal(np.asarray(s2.solution.U),
                                  np.asarray(ref.solution.U))
    np.testing.assert_array_equal(s2.solution.timedata.data(),
                                  ref.solution.timedata.data())


def test_fold_field_device_jitter_bit_matches_natural():
    """Device (threefry) jitter under --fold-field: the stepper folds the
    drawn slab so the same sample values land on the same original cells
    — U trajectory bit-identical to the natural run."""
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    def run(fold):
        p = ct.Parameters()
        p.N = 32
        p.ntmax = 30
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.generator = 'uniform'
        p.jitter = 0.01
        p.jitter_backend = 'device'
        p.seed = 2023
        p.transform_backend = 'split'
        p.kappa_tilde = 2.98911291966116e-4
        p.fold_field = fold
        s = Solver(p)
        s.prepare()
        s.solve_or_resume(30)
        return np.asarray(s.solution.U)

    np.testing.assert_array_equal(run(True), run(False))


def test_fold_field_guards():
    """fold_field composes only with split/xla/single-device (adaptive
    time IS supported — see test_fold_field_adaptive_bit_matches_natural)."""
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    def params(**kw):
        p = ct.Parameters()
        p.N = 64
        p.no_gui = True
        p.transform_backend = 'split'
        p.kappa_tilde = 2.98911291966116e-4
        p.fold_field = True
        for k, v in kw.items():
            setattr(p, k, v)
        return p

    with pytest.raises(ValueError, match='split'):
        Solver(params(transform_backend='matmul'))
    with pytest.raises(ValueError, match='single-device'):
        Solver(params(mesh_shape=(2, 4)))
    with pytest.raises(ValueError, match='kernels xla'):
        Solver(params(kernel_backend='pallas'))
    # adaptive + fold is allowed
    Solver(params(adaptive_time=True))


def test_fold_field_auto_resolution():
    """fold_field=None (the default) auto-folds exactly when it composes:
    split route, single device, XLA kernels (adopted after the measured
    +3.6%% e2e win at N=4096 f32 — artifacts/r3/capture_r3.log)."""
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import resolve_fold_field

    def params(**kw):
        p = ct.Parameters()
        p.N = 4096
        p.precision = 'float32'
        for k, v in kw.items():
            setattr(p, k, v)
        return p

    assert params().fold_field is None
    # f32 N>=1024 resolves to split on any backend -> auto folds
    assert resolve_fold_field(params()) is True
    # composition exclusions resolve the auto to off (no raise)
    assert resolve_fold_field(params(mesh_shape=(2, 4))) is False
    assert resolve_fold_field(params(kernel_backend='pallas')) is False
    assert resolve_fold_field(params(transform_backend='matmul')) is False
    # small grids resolve to matmul -> no fold
    assert resolve_fold_field(params(N=64)) is False
    # explicit choice always wins
    assert resolve_fold_field(params(fold_field=False)) is False
    assert resolve_fold_field(params(N=64, transform_backend='split',
                                     fold_field=True)) is True


def test_split_levels_param_pins_depth():
    """Parameters.split_levels (CLI --split-levels) pins the fold depth of
    the split route; at a PINNED depth --fold-field is a pure layout A/B
    (the auto resolver bumps the depth under fold at N>=4096, which
    changes transform rounding — ADVICE r3)."""
    import chsimpy_tpu as ct
    from chsimpy_tpu.cli import CLIParser
    from chsimpy_tpu.core.solver import Solver
    from chsimpy_tpu.core.stepper import StepConfig

    p = CLIParser().get_parameters([
        '-N', '64', '--no-gui', '--transform', 'split',
        '--split-levels', '3'])
    assert p.split_levels == 3
    s = Solver(p)
    assert s.cfg.split_levels_resolved == 3

    # the auto resolver (no pin) depends on fold_field at N>=4096
    auto_nat = StepConfig(N=4096, dtype='float32', RT=1, BRT=1, B=1, Amr=1,
                          L=1, delx=1, delx2=1, M_tilde=1, threshold=0.875,
                          fold_field=False)
    auto_fold = auto_nat.__class__(**{**auto_nat.__dict__,
                                      'fold_field': True})
    assert auto_nat.split_levels_resolved == 4
    assert auto_fold.split_levels_resolved == 5
    # a pin overrides both
    pinned = auto_nat.__class__(**{**auto_nat.__dict__,
                                   'fold_field': True, 'split_levels': 4})
    assert pinned.split_levels_resolved == 4

    # invalid depth for N raises
    bad = ct.Parameters()
    bad.N = 64
    bad.no_gui = True
    bad.transform_backend = 'split'
    bad.split_levels = 9
    with pytest.raises(ValueError, match='split-levels'):
        Solver(bad)


def test_fold_field_pinned_depth_bit_identity():
    """With --split-levels pinned, fold vs natural is bit-identical in U
    even where the auto resolver would have diverged the depths."""
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    def params(fold):
        p = ct.Parameters()
        p.N = 64
        p.ntmax = 30
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.generator = 'uniform'
        p.seed = 2023
        p.transform_backend = 'split'
        p.split_levels = 3  # pinned: not the auto depth (2) for N=64
        p.kappa_tilde = 2.98911291966116e-4
        p.fold_field = fold
        return p

    nat = Solver(params(False))
    nat.prepare()
    nat.solve_or_resume(30)
    fol = Solver(params(True))
    fol.prepare()
    fol.solve_or_resume(30)
    np.testing.assert_array_equal(np.asarray(fol.solution.U),
                                  np.asarray(nat.solution.U))


@pytest.mark.parametrize('N,levels,hou_min', [
    (64, 2, 16), (64, 3, 16), (128, 3, 32), (256, 4, 64)])
def test_hou_tree_exactness(N, levels, hou_min):
    """The Hou odd-branch recursion (diag -> half-size DCT-II ->
    row-scale -> alternating cumsum) must be an exact DCT: forward
    matches scipy, every route variant (natural, permuted, folded,
    pencil-order inverse) roundtrips at the f64 representation floor."""
    import jax
    from scipy.fft import dctn

    prec = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(7)
    x = rng.normal(size=(N, N))
    xj = jnp.asarray(x)
    tree = dct_ops.hou_tree(N, levels, hou_min=hou_min)
    # at least one odd block must actually be a Hou spec
    def has_hou(t):
        if isinstance(t, tuple):
            return has_hou(t[0]) or has_hou(t[1])
        return isinstance(t, dict)
    assert has_hou(tree)

    ref = dctn(x, norm='ortho')
    X = np.asarray(dct_ops.dct2_split(xj, tree, precision=prec))
    np.testing.assert_allclose(X, ref, rtol=0, atol=1e-12)
    back = np.asarray(dct_ops.idct2_split(jnp.asarray(X), tree,
                                          precision=prec))
    np.testing.assert_allclose(back, x, rtol=0, atol=1e-12)

    Xp = dct_ops.dct2_split_perm(xj, tree, precision=prec)
    np.testing.assert_allclose(
        np.asarray(dct_ops.idct2_split_perm(Xp, tree, precision=prec)),
        x, rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(dct_ops.idct2_split_perm_pencil(Xp, tree,
                                                   precision=prec)),
        x, rtol=0, atol=1e-12)
    # folded variants stay bit-identical to perm composed with fold1
    Xf = dct_ops.dct2_split_perm_folded(dct_ops.fold1(xj), tree,
                                        precision=prec)
    np.testing.assert_array_equal(np.asarray(Xf), np.asarray(Xp))
    Uf = dct_ops.idct2_split_perm_folded(Xp, tree, precision=prec)
    np.testing.assert_array_equal(
        np.asarray(dct_ops.unfold1(Uf)),
        np.asarray(dct_ops.idct2_split_perm(Xp, tree, precision=prec)))


def test_hou_tree_matches_split_permutation():
    """hou_tree emits the same block order as split_tree (drop-in): the
    permuted spectra agree to f64 ULPs."""
    import jax

    prec = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(128, 128)))
    t_split = dct_ops.split_tree(128, 3)
    t_hou = dct_ops.hou_tree(128, 3, hou_min=32)
    a = np.asarray(dct_ops.dct2_split_perm(x, t_split, precision=prec))
    b = np.asarray(dct_ops.dct2_split_perm(x, t_hou, precision=prec))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_resolve_fwd_matmul_precision_rules():
    """Auto 1-pass forward engages only where chip-measured free: f32 +
    split + N>=2048 + unpinned --matmul-precision (PERFORMANCE.md r4)."""
    from chsimpy_tpu.core.solver import resolve_fwd_matmul_precision as r
    p = ct.Parameters()
    p.N = 4096
    p.precision = 'float32'
    assert r(p) == 'default'
    p.N = 512                      # below the measured-free size
    assert r(p) is None
    p.N = 4096
    p.matmul_precision = 'highest'  # user pinned accuracy: stay symmetric
    assert r(p) is None
    p.matmul_precision = None
    p.precision = 'float64'        # validation mode untouched
    assert r(p) is None
    p.precision = 'float32'
    p.fwd_matmul_precision = 'high'  # explicit always wins
    assert r(p) == 'high'
    p.fwd_matmul_precision = None
    p.transform_backend = 'matmul'  # non-split route: symmetric
    assert r(p) is None


def test_fwd_precision_same_trajectory_when_symmetric():
    """fwd_matmul_precision=None lowers to the identical program (the
    property falls back to matmul_precision)."""
    import jax

    from chsimpy_tpu.core.solver import Solver
    p = ct.Parameters()
    p.N = 64
    p.precision = 'float32'
    p.no_gui = True
    p.kappa_tilde = 2.98911291966116e-4
    a = Solver(p).cfg
    assert a.fwd_mm_precision == a.mm_precision
    p2 = ct.Parameters()
    p2.N = 64
    p2.precision = 'float32'
    p2.no_gui = True
    p2.kappa_tilde = 2.98911291966116e-4
    p2.matmul_precision = 'high'
    p2.fwd_matmul_precision = 'default'
    b = Solver(p2).cfg
    assert b.fwd_mm_precision == jax.lax.Precision.DEFAULT
    assert b.mm_precision == jax.lax.Precision.HIGH
