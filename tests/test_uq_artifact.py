"""Committed end-to-end UQ experiment artifact: the on-chip
chsimpy-tpu-experiment product (R=16, sobol A-source, N=512, float32,
artifacts/r4/uq/tpu-*) compared column-for-column against the SAME
experiment run with the reference implementation on CPU
(artifacts/r4/uq/ref-*, same A-plan: sobol, A-seed 85972).

This pins the experiment PRODUCT — the CSVs the paper's workflow ships
(reference ``chsimpy/experiment.py:218-229``) — not just the ensemble
throughput.  Tolerances are the f32 ladder: the A-plan and the sympy
postprocessing (ca/cb/sa/sb from each run's A0/A1) must match at f64
level; the stop-step statistics (tau0/t0/tsep) carry the known f32
trajectory scatter (PERFORMANCE.md: the E2 early-stop comparison flips
on ~1e-7 noise, +-0.5% on the stop step)."""

import os

import numpy as np
import pandas as pd
import pytest

UQ_DIR = os.path.join(os.path.dirname(__file__), '..',
                      'artifacts', 'r4', 'uq')

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(UQ_DIR, 'tpu-results.csv')),
    reason='round-4 UQ artifact not present')


def _load(which):
    df = pd.read_csv(os.path.join(UQ_DIR, f'{which}-results.csv'),
                     index_col=0)
    return df.sort_values('id').reset_index(drop=True)


def test_results_columns_match_reference_format():
    ref = _load('ref')
    tpu = _load('tpu')
    assert list(ref.columns) == ['A0', 'A1', 'ca', 'cb', 'sa', 'sb',
                                 'tau0', 't0', 'tsep', 'id',
                                 'fac_A0', 'fac_A1']
    assert list(tpu.columns) == list(ref.columns)
    assert len(ref) == len(tpu) == 16
    assert sorted(ref['id']) == sorted(tpu['id']) == list(range(16))


def test_a_plan_bit_compatible():
    """Same sobol A-seed -> same perturbation factors and the same
    per-run A0/A1, at f64 precision (the A-plan is host-side on both
    sides; any mismatch means the streams diverged)."""
    ref = _load('ref')
    tpu = _load('tpu')
    for col in ('fac_A0', 'fac_A1', 'A0', 'A1'):
        np.testing.assert_allclose(tpu[col], ref[col], rtol=1e-14)


def test_material_postprocessing_matches():
    """Miscibility gap (ca, cb) and spinodal roots (sa, sb) come from
    the same sympy solves on the same A0/A1.  The reference serializes
    them as 7-significant-digit sympy reprs (its csv carries e.g.
    0.8162315), so the comparison is bounded by ITS print precision,
    not the math."""
    ref = _load('ref')
    tpu = _load('tpu')
    for col in ('ca', 'cb', 'sa', 'sb'):
        np.testing.assert_allclose(tpu[col].astype(float),
                                   ref[col].astype(float), rtol=5e-7)


def test_stop_statistics_within_f32_ladder():
    """Per-run stop steps scatter by the known f32 trajectory noise
    (<= 0.6% per run); ensemble means must agree to <= 0.3%."""
    ref = _load('ref')
    tpu = _load('tpu')
    np.testing.assert_allclose(tpu['tau0'], ref['tau0'], rtol=6e-3)
    np.testing.assert_allclose(tpu['t0'], ref['t0'], rtol=6e-3)
    np.testing.assert_allclose(tpu['tsep'], ref['tsep'], rtol=6e-3)
    for col in ('tau0', 't0', 'tsep'):
        assert abs(tpu[col].mean() / ref[col].mean() - 1) < 3e-3, col


def test_agg_format_and_shared_rows():
    """results-agg.csv: describe() + cv rows.  The reference's describe
    drops ca/cb/sa/sb (they are sympy objects in its DataFrame); ours
    aggregates them as floats — a strict superset.  Shared rows agree
    within the f32 ladder."""
    ragg = pd.read_csv(os.path.join(UQ_DIR, 'ref-results-agg.csv'),
                       index_col=0)
    tagg = pd.read_csv(os.path.join(UQ_DIR, 'tpu-results-agg.csv'),
                       index_col=0)
    assert list(ragg.columns) == list(tagg.columns) == [
        'count', 'mean', 'std', 'min', '25%', '50%', '75%', 'max', 'cv']
    assert set(ragg.index) <= set(tagg.index)
    for row in ragg.index:
        rtol = 1e-12 if row in ('A0', 'A1', 'fac_A0', 'fac_A1') else 6e-3
        np.testing.assert_allclose(tagg.loc[row, 'mean'],
                                   ragg.loc[row, 'mean'], rtol=rtol)
        # std of the stop statistics is a difference of similar-size
        # numbers — looser
        np.testing.assert_allclose(
            tagg.loc[row, 'std'], ragg.loc[row, 'std'],
            rtol=1e-10 if rtol == 1e-12 else 2e-1)


# ---------------------------------------------------------------------------
# Round 5: float64 VALIDATION-MODE experiment artifact — the same R=16
# sobol design run on-chip in f64 (artifacts/r5/uq_f64/tpu64-*): the
# product's headline statistic (per-member tau0) must match the
# reference's own run EXACTLY, not within the f32 ladder.

UQ64_DIR = os.path.join(os.path.dirname(__file__), '..',
                        'artifacts', 'r5', 'uq_f64')

uq64 = pytest.mark.skipif(
    not os.path.exists(os.path.join(UQ64_DIR, 'tpu64-results.csv')),
    reason='round-5 f64 UQ artifact not present')


def _load64():
    df = pd.read_csv(os.path.join(UQ64_DIR, 'tpu64-results.csv'),
                     index_col=0)
    return df.sort_values('id').reset_index(drop=True)


@uq64
def test_f64_stop_statistics_exact():
    """Per-member tau0 and tsep (integer step indices) are EQUAL to the
    reference's, member for member; t0 (simulated seconds at tau0)
    matches at accumulation ULPs.  This is the contract-grade form of
    the f32-ladder test above: in validation mode the experiment product
    is exact, not statistically compatible."""
    ref = _load('ref')
    tpu = _load64()
    assert len(tpu) == len(ref) == 16
    np.testing.assert_array_equal(tpu['tau0'].to_numpy(),
                                  ref['tau0'].to_numpy())
    np.testing.assert_array_equal(tpu['tsep'].to_numpy(),
                                  ref['tsep'].to_numpy())
    np.testing.assert_allclose(tpu['t0'], ref['t0'], rtol=1e-12)


@uq64
def test_f64_a_plan_and_material_exact():
    """A-plan at f64 bit compatibility; sympy postprocessing bounded by
    the reference csv's 7-significant-digit print precision."""
    ref = _load('ref')
    tpu = _load64()
    for col in ('fac_A0', 'fac_A1', 'A0', 'A1'):
        np.testing.assert_allclose(tpu[col], ref[col], rtol=1e-14)
    for col in ('ca', 'cb', 'sa', 'sb'):
        np.testing.assert_allclose(tpu[col].astype(float),
                                   ref[col].astype(float), rtol=5e-7)
