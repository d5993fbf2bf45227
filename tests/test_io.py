"""I/O subsystem: YAML scalar round-trips (params + solution), CSV/bz2
matrix round-trips, export dispatch, validation helper
(reference tests/test.py:40-119 expanded)."""

import numpy as np
import pytest

import chsimpy_tpu as ct
from chsimpy_tpu import rng
from chsimpy_tpu.io import csvio, yamlio


def test_params_yaml_roundtrip(tmp_path):
    f = str(tmp_path / 'p.yaml')
    p1 = ct.Parameters()
    p1.yaml_export_scalars(f)
    p2 = ct.Parameters()
    p2.yaml_import_scalars(f)
    assert p1.is_scalarwise_equal_with(p2)


def test_params_yaml_mismatch_detected(tmp_path):
    f = str(tmp_path / 'p.yaml')
    p1 = ct.Parameters()
    p1.N = 512
    p1.yaml_export_scalars(f)
    data = yamlio.import_scalars(f)
    p1.N = 256
    assert data['N'] == 512 and p1.N == 256


def test_solution_yaml_roundtrip(tmp_path):
    f = str(tmp_path / 's.yaml')
    p = ct.Parameters()
    p.kappa_tilde = 3e-4
    s1 = ct.Solution(p)
    s1.yaml_export_scalars(f)
    data = yamlio.import_scalars(f)
    assert s1.is_scalarwise_equal_with(data)
    assert np.isclose(data['RT'], s1.RT)


def test_solution_yaml_includes_kappa_sympy_path(tmp_path):
    # exercises the sympy kappa derivation like reference tests/test.py:80-90
    f = str(tmp_path / 's2.yaml')
    s1 = ct.Solution(ct.Parameters())
    s1.yaml_export_scalars(f)
    data = yamlio.import_scalars(f)
    assert np.isclose(data['kappa_base'], 0.0314436558796025, rtol=1e-10)


def test_csv_roundtrip(tmp_path):
    f = str(tmp_path / 'm.csv')
    m = rng.matlab_lcg_sample(55, 34, 2023)
    csvio.csv_export_matrix(m, f)
    back = csvio.csv_import_matrix(f)
    assert np.allclose(m, back)


def test_csv_bz2_roundtrip(tmp_path):
    f = str(tmp_path / 'm.csv.bz2')
    m = np.random.default_rng(1).random((54, 33))
    csvio.csv_export_matrix(m, f)
    back = csvio.csv_import_matrix(f)
    assert np.allclose(m, back)


def test_validate_solution_files(tmp_path):
    a = tmp_path / 'a.txt'
    b = tmp_path / 'b.txt'
    a.write_text('x\ny\n')
    b.write_text('x\ny\n')
    assert csvio.validate_solution_files(str(a), str(b))
    b.write_text('x\nz\n')
    assert not csvio.validate_solution_files(str(a), str(b))


def test_reference_yaml_tags_parse(tmp_path):
    """Files written by the reference (ruamel tags) must import."""
    f = tmp_path / 'ref.yaml'
    f.write_text(
        "--- !Parameters\n"
        "N: 256\n"
        "seed: 11\n"
        "delt: !numpy.float64 3.0e-08\n"
        "func_A0: 'lambda temp: utils.A0(temp)'\n")
    p = ct.Parameters()
    p.yaml_import_scalars(str(f))
    assert p.N == 256 and p.seed == 11
    assert p.delt == 3e-8
    # lambda strings are skipped, default behavior retained
    assert np.isclose(p.func_A0(923.15), -151.26151, atol=1e-5)


def test_ndarray_tag_no_eval(tmp_path):
    f = tmp_path / 'nd.yaml'
    f.write_text("--- !Solution\nU: !ndarray |\n  [[1.0,2.0],[3.0,4.0]]\n")
    data = yamlio.import_scalars(str(f))
    np.testing.assert_array_equal(data['U'], [[1.0, 2.0], [3.0, 4.0]])
    # malicious payloads must fail, not execute
    g = tmp_path / 'evil.yaml'
    g.write_text("--- !Solution\nU: !ndarray |\n"
                 "  __import__('os').system('true')\n")
    with pytest.raises(Exception):
        yamlio.import_scalars(str(g))


def test_export_dispatch(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = ct.Parameters()
    p.N = 16
    p.ntmax = 5
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.kappa_tilde = 3e-4
    p.yaml = True
    p.export_csv = 'U,E,E2,SA'
    p.file_id = 'exptest'
    sim = ct.Simulator(p)
    sim.solve()
    sim.export()
    assert (tmp_path / 'exptest.solution.yaml').exists()
    for m in ('U', 'E', 'E2', 'SA'):
        assert (tmp_path / f'exptest.solution.{m}.csv').exists()
    U = csvio.csv_import_matrix(str(tmp_path / 'exptest.solution.U.csv'))
    np.testing.assert_array_equal(U, sim.solver.solution.U)  # repr round-trip


def _reference_solution_yaml_with_arrays(path, scalars, arrays):
    """Write a Solution YAML in the reference's exact on-disk format for
    array members: ``!ndarray`` block-literal scalars containing
    ``np.array2string(data, separator=',', threshold=2147483647)``
    (writer: ``chsimpy/utils.py:52-56`` via ruamel represent_scalar
    style='|').  The reference never *emits* these itself (the representer
    is defined but unregistered) — they come from external tooling — but
    its importer accepts them (``chsimpy/utils.py:61-64,70-76``)."""
    lines = ["--- !Solution"]
    for k, v in scalars.items():
        lines.append(f"{k}: {v}")
    for name, arr in arrays.items():
        text = np.array2string(arr, separator=',', threshold=2147483647)
        lines.append(f"{name}: !ndarray |-")
        lines.extend('  ' + ln for ln in text.split('\n'))
    path.write_text("\n".join(lines) + "\n")


def test_reference_solution_yaml_ndarray_roundtrip(tmp_path):
    """End-to-end import of a reference-format Solution YAML whose U is a
    full !ndarray field: parse, recover the matrix, and drive a simulation
    from it as the initial field."""
    N = 8
    rng_np = np.random.default_rng(7)
    # reference writer precision: np.array2string defaults to 8 significant
    # digits, so round-trippable values must fit that budget
    U = np.round(0.85 + 0.05 * rng_np.random((N, N)), 6)
    E2 = np.round(rng_np.random(5), 6)
    f = tmp_path / 'ref-solution.yaml'
    _reference_solution_yaml_with_arrays(
        f, {'computed_steps': 42, 'tau0': 17, 'stop_reason': 'energy',
            't0': '!numpy.float64 12.5'},
        {'U': U, 'E2': E2})
    data = yamlio.import_scalars(str(f))
    assert data['computed_steps'] == 42
    assert data['stop_reason'] == 'energy'
    assert data['t0'] == 12.5
    np.testing.assert_array_equal(np.asarray(data['U']), U)
    np.testing.assert_array_equal(np.asarray(data['E2']), E2)
    # the recovered field drives a run (the reference's main use of array
    # import: restart from a previously exported state)
    p = ct.Parameters()
    p.N = N
    p.ntmax = 5
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.kappa_tilde = 2.98911291966116e-4
    sol = ct.Simulator(p, U_init=np.asarray(data['U'])).solve()
    assert sol.computed_steps == 5
    np.testing.assert_allclose(float(np.mean(np.asarray(sol.U))),
                               float(np.mean(U)), rtol=1e-10)


def test_export_cheig_seig(tmp_path, monkeypatch):
    """--export-csv CHeig,Seig works like the reference (its Solution
    holds the spectral grids as members, chsimpy/solution.py:52-55)."""
    monkeypatch.chdir(tmp_path)
    p = ct.Parameters()
    p.N = 16
    p.ntmax = 5
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.kappa_tilde = 2.98911291966116e-4
    p.export_csv = 'CHeig,Seig'
    sim = ct.Simulator(p)
    sim.solve()
    fid = sim.export()
    che = np.loadtxt(f"{fid}.CHeig.csv", delimiter=',')
    seig = np.loadtxt(f"{fid}.Seig.csv", delimiter=',')
    # reference formula, natural order (chsimpy/utils.py:34-49)
    k = np.arange(16.0)
    e = 2 * np.cos(np.pi * k / 15) - 2
    leig = e[:, None] + e[None, :]
    lam1 = p.delt / (2.0 / 15) ** 2
    lam2 = p.kappa_tilde * lam1 / (2.0 / 15) ** 2
    np.testing.assert_allclose(che, 1 + lam2 * leig * leig, rtol=1e-12)
    np.testing.assert_allclose(seig, lam1 * leig, rtol=1e-12)
