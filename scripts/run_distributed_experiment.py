#!/usr/bin/env python
"""End-to-end multi-process run of the PRODUCT experiment CLI.

The reference's only multi-process surface is its UQ experiment driver
(``chsimpy/experiment.py:197-216``, a same-host fork pool).  Here the
equivalent product surface is ``chsimpy-tpu-experiment --coordinator ...``:
every process joins one ``jax.distributed`` runtime, the ensemble axis of
the global ('ens','x','y') mesh spans all processes' devices, each process
runs the host pipeline (bz2 export, PNG, sympy postproc) for the members it
owns, and the result rows are gathered with a ``process_allgather`` so
process 0 writes the same results.csv an uninterrupted single-process run
writes — byte-identical, which this script proves:

* launches ``--nproc`` OS processes of ``chsimpy_tpu.experiment`` on
  localhost (4-device virtual CPU backends; 8 global devices);
* runs the SAME command line single-process on an 8-device backend (with
  ``--num-processes 1``, so the same ('ens','x','y') = (8,1,1) mesh is
  used — member programs are identical, only the process split differs);
* byte-compares ``<id>-results.csv`` and ``<id>-results-agg.csv`` and
  checks the per-run export files both produced.

Usage:  python scripts/run_distributed_experiment.py [--nproc 2] [--out X.json]
Exit 0 + a JSON artifact on byte-identical results.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_DEVICES = 8
EXP_ARGS = [
    '-N', '32', '-n', '30', '--generator', 'lcg', '--seed', '2023',
    '--kappa-tilde', '2.98911291966116e-4',
    '--runs', '8', '--A-source', 'uniform', '--A-seed', '85972',
    '--file-id', 'distexp', '--host-procs', '2',
]


def launch(workdir, nproc, coordinator, extra):
    env = dict(os.environ)
    env['XLA_FLAGS'] = (f'--xla_force_host_platform_device_count='
                        f'{N_DEVICES // nproc}')
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    procs = []
    for pid in range(nproc):
        argv = [sys.executable, '-m', 'chsimpy_tpu.experiment',
                *EXP_ARGS, *extra,
                '--coordinator', coordinator,
                '--num-processes', str(nproc), '--process-id', str(pid)]
        procs.append(subprocess.Popen(argv, env=env, cwd=workdir,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    rcs = [p.returncode for p in procs]
    return rcs, outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default=os.path.join(REPO, 'DISTEXP.json'))
    ap.add_argument('--nproc', type=int, default=2)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix='chsimpy-distexp-')
    dist_dir = os.path.join(tmp, 'dist')
    single_dir = os.path.join(tmp, 'single')
    os.makedirs(dist_dir)
    os.makedirs(single_dir)
    port = 12000 + os.getpid() % 20000
    coordinator = f"127.0.0.1:{port}"

    rcs, outs = launch(dist_dir, args.nproc, coordinator, [])
    if any(rcs):
        for o in outs:
            print(o[-3000:])
        print(f"FAIL: distributed experiment exit codes {rcs}")
        return 1

    # single-process run on the same 8-device mesh (--num-processes 1
    # builds the mesh but skips jax.distributed.initialize)
    rcs1, outs1 = launch(single_dir, 1, f"127.0.0.1:{port + 1}", [])
    if any(rcs1):
        print(outs1[0][-3000:])
        print("FAIL: single-process reference run failed")
        return 1

    identical = {}
    for fname in ('distexp-results.csv', 'distexp-results-agg.csv'):
        with open(os.path.join(dist_dir, fname), 'rb') as f:
            a = f.read()
        with open(os.path.join(single_dir, fname), 'rb') as f:
            b = f.read()
        identical[fname] = a == b

    # per-run product files: every member exported exactly once, by its
    # owning process, into the shared working directory
    run_files = sorted(f for f in os.listdir(dist_dir)
                       if '-run' in f)
    run_files_single = sorted(f for f in os.listdir(single_dir)
                              if '-run' in f)
    files_match = run_files == run_files_single and len(run_files) > 0

    ok = all(identical.values()) and files_match
    artifact = {
        'schema': 'chsimpy-tpu-distributed-experiment-v1',
        'command': 'chsimpy-tpu-experiment ' + ' '.join(EXP_ARGS),
        'processes': args.nproc,
        'devices_per_process': N_DEVICES // args.nproc,
        'mesh': {'axes': ['ens', 'x', 'y'],
                 'shape': [N_DEVICES, 1, 1]},
        'results_csv_byte_identical': identical['distexp-results.csv'],
        'results_agg_byte_identical':
            identical['distexp-results-agg.csv'],
        'per_run_file_sets_match': files_match,
        'n_run_files': len(run_files),
    }
    with open(args.out, 'w') as f:
        json.dump(artifact, f, indent=1)
    print(f"results.csv byte-identical: {identical['distexp-results.csv']}, "
          f"agg: {identical['distexp-results-agg.csv']}, "
          f"run files: {len(run_files)} match={files_match} -> {args.out}")
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
