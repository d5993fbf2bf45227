#!/usr/bin/env python
"""Multi-process ``jax.distributed`` exercise of the ensemble path.

Launches ``--nproc`` OS processes on localhost (coordinator + workers,
8/nproc virtual CPU devices each), builds the global 8-device
('ens','x','y') = (2,2,2) mesh ACROSS the process boundaries, runs the
vmapped UQ ensemble sharded over it, and bit-compares the result against
the same run on a single-process 8-device virtual mesh.  This proves the
cross-process codepath (global array construction, ens-axis all-gather
host reads, collective-bearing step program) end to end — the same
machinery a real multi-host TPU slice uses, with DCN standing in for the
ICI.  nproc=4 exercises >2 processes: every process holds a strict
minority of each array, so host reads cross two process boundaries.

Usage:
    python scripts/run_distributed_2proc.py [--nproc 2|4] [--out X.json]

Exit 0 + a JSON artifact on bit-exact agreement.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG = dict(N=32, ntmax=30, R=4, seed=2023)


def build_params(transform='auto'):
    import chsimpy_tpu as ct
    p = ct.Parameters()
    p.N = CONFIG['N']
    p.ntmax = CONFIG['ntmax']
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.seed = CONFIG['seed']
    p.kappa_tilde = 2.98911291966116e-4
    # 'auto' resolves to the GSPMD matmul route here; 'split' exercises
    # the PENCIL layout cross-process (its transpose all-to-alls ride
    # the DCN stand-in), 'ozaki' the pencil int8-stack variant
    p.transform_backend = transform
    return p


def build_pairs(params):
    import numpy as np
    from chsimpy_tpu import material
    A0 = material.A0(params.temp)
    A1 = material.A1(params.temp)
    facs = [(1.0, 1.0), (1.004, 0.997), (0.995, 1.005), (1.002, 1.002)]
    return np.array([[A0 * f0, A1 * f1] for f0, f1 in facs])


def run_ensemble(mesh, transform='auto'):
    import numpy as np
    from chsimpy_tpu.ensemble import EnsembleSolver
    params = build_params(transform)
    ens = EnsembleSolver(params, build_pairs(params), mesh=mesh)
    ens.prepare()
    sols = ens.solve_or_resume(params.ntmax)
    return {
        'U_sums': [float(np.sum(np.asarray(s.U))) for s in sols],
        'steps': [int(s.computed_steps) for s in sols],
        'E_last': [float(s.E[-1]) for s in sols],
        'E_all': [np.asarray(s.E).tolist() for s in sols],
        'U0_rows': [np.asarray(s.U)[0, :4].tolist() for s in sols],
    }


def worker(process_id, num_processes, coordinator, out_path,
           transform='auto'):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from chsimpy_tpu.parallel import distributed
    topo = distributed.initialize(coordinator_address=coordinator,
                                  num_processes=num_processes,
                                  process_id=process_id)
    assert topo['global_devices'] == 8, topo
    assert topo['process_count'] == num_processes
    hb = distributed.Heartbeat(interval_s=30.0).start()
    from chsimpy_tpu.parallel.mesh import make_ensemble_mesh
    mesh = make_ensemble_mesh(2, (2, 2))
    result = run_ensemble(mesh, transform)
    result['process_id'] = process_id
    result['process_count'] = jax.process_count()
    result['local_devices'] = jax.local_device_count()
    hb.stop()
    if process_id == 0:
        with open(out_path, 'w') as f:
            json.dump(result, f)
    print(f"[proc {process_id}] done: steps={result['steps']}")


def single_process_reference(out_path, transform='auto'):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from chsimpy_tpu.parallel.mesh import make_ensemble_mesh
    mesh = make_ensemble_mesh(2, (2, 2))
    result = run_ensemble(mesh, transform)
    with open(out_path, 'w') as f:
        json.dump(result, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default=os.path.join(REPO, 'DISTRIBUTED.json'))
    ap.add_argument('--nproc', type=int, default=2, choices=(2, 4),
                    help='processes to split the 8-device mesh across')
    ap.add_argument('--worker', type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument('--coordinator', default=None, help=argparse.SUPPRESS)
    ap.add_argument('--result-file', default=None, help=argparse.SUPPRESS)
    ap.add_argument('--single', action='store_true', help=argparse.SUPPRESS)
    ap.add_argument('--transform', default='auto',
                    choices=('auto', 'split', 'ozaki'),
                    help='transform route (split/ozaki = pencil layout '
                         'cross-process)')
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.nproc, args.coordinator, args.result_file,
               args.transform)
        return 0
    if args.single:
        single_process_reference(args.result_file, args.transform)
        return 0

    nproc = args.nproc
    tmp = tempfile.mkdtemp(prefix='chsimpy-dist-')
    dist_out = os.path.join(tmp, 'dist.json')
    single_out = os.path.join(tmp, 'single.json')
    port = 12000 + os.getpid() % 20000
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env['XLA_FLAGS'] = (f'--xla_force_host_platform_device_count='
                        f'{8 // nproc}')
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')

    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), '--worker', str(i),
         '--nproc', str(nproc), '--transform', args.transform,
         '--coordinator', coordinator, '--result-file', dist_out],
        env=env, cwd=tmp) for i in range(nproc)]
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        print(f"FAIL: worker exit codes {rcs}")
        return 1

    env1 = dict(env)
    env1['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '--single',
         '--transform', args.transform,
         '--result-file', single_out], env=env1, cwd=tmp).returncode
    if rc:
        print("FAIL: single-process reference run failed")
        return 1

    with open(dist_out) as f:
        dist = json.load(f)
    with open(single_out) as f:
        single = json.load(f)

    # fields/steps must be BIT-identical across the process split; the
    # E trace goes through a cross-process all-reduce whose partial
    # order may differ from the single-process one (measured: <=2 ULP
    # for the pencil routes, 0 for the grid matmul), so E is gated at
    # reduction-order ULPs
    fields_exact = all(dist[k] == single[k]
                       for k in ('U_sums', 'steps', 'U0_rows'))
    e_max_rel = max(
        (abs(a / b - 1.0) for da, sa in zip(dist['E_all'], single['E_all'])
         for a, b in zip(da, sa)), default=0.0)
    ok = fields_exact and e_max_rel <= 1e-12
    artifact = {
        'schema': 'chsimpy-tpu-distributed-nproc-v2',
        'config': CONFIG,
        'transform': args.transform,
        'mesh': {'axes': ['ens', 'x', 'y'], 'shape': [2, 2, 2]},
        'processes': nproc,
        'devices_per_process': 8 // nproc,
        'fields_bit_exact_vs_single_process': fields_exact,
        'E_trace_bit_exact': dist['E_all'] == single['E_all'],
        'E_max_rel_vs_single_process': e_max_rel,
        'steps': dist['steps'],
        'U_sums': dist['U_sums'],
        'E_last': dist['E_last'],
    }
    with open(args.out, 'w') as f:
        json.dump(artifact, f, indent=1)
    print(f"fields bit-exact: {fields_exact}, E max rel: {e_max_rel:.2e} "
          f"-> {args.out}")
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
