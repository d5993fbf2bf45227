#!/usr/bin/env python
"""Scaling-efficiency benchmark.

Measures steps/s of the sharded solver at 1 device vs an n-device mesh and
reports weak/strong scaling efficiency (the ≥80%-on-2-hosts target).  Two
modes:

* ``--axis grid``: strong scaling of one big field — the (N, N) grid is
  sharded P('x','y'); the distributed matmul-DCT's ICI collectives are the
  communication cost being measured.
* ``--axis ens``: weak scaling of the UQ ensemble — R members sharded over
  the 'ens' axis; embarrassingly parallel, efficiency should be ~100%.

On a multi-host pod, run one process per host with ``--distributed`` (uses
``jax.distributed``; coordinator env vars per the JAX docs).  On a CPU-only
machine, ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` exercises
the harness end-to-end (numbers then measure the harness, not hardware).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def solve_rate(params, nsteps: int, mesh_shape=None) -> float:
    from ..core.solver import Solver
    p = params.deepcopy()
    p.mesh_shape = mesh_shape
    solver = Solver(p)
    solver.prepare()
    solver.solve_or_resume(min(nsteps, 32))  # warm
    solver.prepare()
    t0 = time.time()
    sol = solver.solve_or_resume(nsteps)
    return (sol.computed_steps - 1) / (time.time() - t0)


def ensemble_rate(params, nsteps: int, R: int, mesh=None) -> float:
    from .. import material
    from ..ensemble import EnsembleSolver
    A0 = material.A0(params.temp)
    A1 = material.A1(params.temp)
    pairs = np.array([[A0 * (1 + 1e-4 * i), A1] for i in range(R)])
    ens = EnsembleSolver(params, pairs, mesh=mesh)
    ens.prepare()
    ens.solve_or_resume(min(nsteps, 32))
    ens.prepare()
    t0 = time.time()
    sols = ens.solve_or_resume(nsteps)
    steps = sum(s.computed_steps - 1 for s in sols)
    return steps / (time.time() - t0)


def main(argv=None):
    import chsimpy_tpu as _ct
    _ct.honor_jax_platforms_env()
    parser = argparse.ArgumentParser(prog='chsimpy-tpu-scaling')
    parser.add_argument('--axis', choices=['grid', 'ens'], default='grid')
    parser.add_argument('-N', type=int, default=2048)
    parser.add_argument('-n', '--nsteps', type=int, default=128)
    parser.add_argument('-R', '--runs', type=int, default=None,
                        help='ensemble members (default: device count)')
    parser.add_argument('--precision', default='float32')
    parser.add_argument('--distributed', action='store_true',
                        help='initialize jax.distributed first')
    args = parser.parse_args(argv)

    if args.distributed:
        from ..parallel.distributed import initialize
        print(initialize(), file=sys.stderr)

    import jax

    import chsimpy_tpu as ct
    from ..parallel.mesh import best_grid_shape, make_ensemble_mesh

    ndev = jax.device_count()
    p = ct.Parameters()
    p.N = args.N
    p.ntmax = args.nsteps
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.precision = args.precision
    p.kappa_tilde = 2.98911291966116e-4

    if args.axis == 'grid':
        base = solve_rate(p, args.nsteps, mesh_shape=None)
        mesh_shape = best_grid_shape(ndev)
        sharded = solve_rate(p, args.nsteps, mesh_shape=mesh_shape)
        eff = sharded / (base * ndev)
        out = {'axis': 'grid', 'N': args.N, 'devices': ndev,
               'mesh': list(mesh_shape),
               'steps_per_s_1dev': round(base, 3),
               'steps_per_s_mesh': round(sharded, 3),
               'speedup': round(sharded / base, 3),
               'scaling_efficiency': round(eff, 4)}
    else:
        R = args.runs or ndev
        base = ensemble_rate(p, args.nsteps, R, mesh=None)
        mesh = make_ensemble_mesh(ndev)
        sharded = ensemble_rate(p, args.nsteps, R, mesh=mesh)
        eff = sharded / (base * ndev)
        out = {'axis': 'ens', 'N': args.N, 'devices': ndev, 'members': R,
               'member_steps_per_s_1dev': round(base, 3),
               'member_steps_per_s_mesh': round(sharded, 3),
               'speedup': round(sharded / base, 3),
               'scaling_efficiency': round(eff, 4)}
    print(json.dumps(out))


if __name__ == '__main__':
    main()
