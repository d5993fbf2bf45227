"""Validation comparator tests."""

import numpy as np

from chsimpy_tpu import validate


def fake_trace(n=50, seed=0):
    rng = np.random.default_rng(seed)
    t = np.zeros((n, 9))
    t[:, 0] = np.arange(n)
    t[:, 1] = -5e-11 * (1 + 1e-6 * rng.random(n))
    t[:, 2] = 1e-17 * (1 + rng.random(n))
    t[:, 8] = 3e-8
    return t


def test_identical_traces_pass():
    t = fake_trace()
    rep = validate.compare_traces(t.copy(), t)
    assert rep.ok
    assert 'OK' in str(rep)


def test_E_violation_detected():
    t = fake_trace()
    t2 = t.copy()
    t2[10, 1] *= (1 + 1e-8)  # E off by 1e-8 > 1e-10 tol
    rep = validate.compare_traces(t2, t)
    assert not rep.ok
    assert any('E:' in f for f in rep.failures)


def test_exact_column_mismatch():
    t = fake_trace()
    t2 = t.copy()
    t2[3, 0] = 99
    rep = validate.compare_traces(t2, t)
    assert not rep.ok


def test_shape_mismatch():
    rep = validate.compare_traces(fake_trace(10), fake_trace(20))
    assert not rep.ok


def test_compare_fields():
    rng = np.random.default_rng(1)
    U = 0.875 + 0.01 * rng.random((32, 32))
    out = validate.compare_fields(U.copy(), U)
    assert out['ok']
    out2 = validate.compare_fields(U + 1e-3, U)
    assert not out2['ok']


def test_compare_solution_csvs(tmp_path):
    from chsimpy_tpu.io import csvio
    rng = np.random.default_rng(2)
    U = rng.random((16, 16))
    a = str(tmp_path / 'a.csv')
    b = str(tmp_path / 'b.csv.bz2')
    csvio.csv_export_matrix(U, a)
    csvio.csv_export_matrix(U, b)
    assert validate.compare_solution_csvs(a, b)['ok']
