"""Real multi-process jax.distributed execution (2 localhost processes,
4 virtual CPU devices each, global ('ens','x','y') mesh): the ensemble
must bit-match the single-process virtual-mesh run.

Runs scripts/run_distributed_2proc.py in subprocesses so this test owns
no backend state.  ~1-2 min; the committed DISTRIBUTED_r02.json artifact
is the per-round record of the same check."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_ensemble_bit_matches_single(tmp_path):
    out = tmp_path / 'dist.json'
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)  # the script sets its own device counts
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, 'scripts', 'run_distributed_2proc.py'),
         '--out', str(out)],
        env=env, capture_output=True, text=True, timeout=570)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    with open(out) as f:
        artifact = json.load(f)
    assert artifact['fields_bit_exact_vs_single_process'] is True
    assert artifact['E_max_rel_vs_single_process'] <= 1e-12
    assert artifact['processes'] == 2


def test_four_process_ensemble_bit_matches_single(tmp_path):
    """4 processes x 2 devices: every process holds a strict minority of
    each global array, so host reads cross multiple process boundaries
    (the >2-host codepath a real pod uses)."""
    out = tmp_path / 'dist4.json'
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, 'scripts', 'run_distributed_2proc.py'),
         '--nproc', '4', '--out', str(out)],
        env=env, capture_output=True, text=True, timeout=570)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    with open(out) as f:
        artifact = json.load(f)
    assert artifact['fields_bit_exact_vs_single_process'] is True
    assert artifact['E_max_rel_vs_single_process'] <= 1e-12
    assert artifact['processes'] == 4
    assert artifact['devices_per_process'] == 2


def test_two_process_experiment_cli_byte_identical_results(tmp_path):
    """The PRODUCT surface end-to-end: ``chsimpy-tpu-experiment
    --coordinator ...`` as two jax.distributed processes (ens axis over
    the process split, per-process host pipelines) must write results.csv
    and results-agg.csv BYTE-identical to the same command line run
    single-process on the same 8-device mesh — the reference's only
    multi-process entry point (chsimpy/experiment.py:197-216), proven at
    the CLI layer rather than the EnsembleSolver library layer."""
    out = tmp_path / 'distexp.json'
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, 'scripts', 'run_distributed_experiment.py'),
         '--out', str(out)],
        env=env, capture_output=True, text=True, timeout=570)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    with open(out) as f:
        artifact = json.load(f)
    assert artifact['results_csv_byte_identical'] is True
    assert artifact['results_agg_byte_identical'] is True
    assert artifact['per_run_file_sets_match'] is True
    assert artifact['processes'] == 2


def test_two_process_pencil_split_fields_bit_match(tmp_path):
    """The pencil layout cross-process: its transpose all-to-alls ride
    the DCN stand-in (gloo); member fields must stay BIT-identical to
    the single-process 8-device run (every matmul contracts a local
    axis), with the E trace at cross-process all-reduce ULPs."""
    out = tmp_path / 'dist_pencil.json'
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, 'scripts', 'run_distributed_2proc.py'),
         '--transform', 'split', '--out', str(out)],
        env=env, capture_output=True, text=True, timeout=570)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    with open(out) as f:
        artifact = json.load(f)
    assert artifact['transform'] == 'split'
    assert artifact['fields_bit_exact_vs_single_process'] is True
    assert artifact['E_max_rel_vs_single_process'] <= 1e-12
