#!/usr/bin/env python
"""Replay golden reference traces on the live (TPU) backend.

The CI suite replays the goldens on the CPU backend (bit-level f64); this
script replays them on the chip — the acceptance gate for any change to
the TPU float64 path (ozaki transform, split-f64, fast stats).  Reports
the max relative E error vs the reference trace and the stop-step match.

Usage:  python scripts/tpu_golden_replay.py [--transform ozaki] \
            [--goldens n64_lcg_200,n128_uniform_300]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), '..', 'tests', 'golden')

# per-trace E tolerances, mirroring tests/test_golden.py: the adaptive
# path feeds delt back through the (chaotically amplifying) nonlinear
# term, so its trace tolerance is looser there too
RTOL_E = {'n64_adaptive_600': 1e-8}
DEFAULT_RTOL_E = 1e-10

# the default battery is EVERY trace golden (all of tests/golden/ except
# the anchors-only default_n512_anchors, which scripts/probes/
# canonical_gate.py replays, and n64_timemax: that golden is an
# INTENTIONAL knife edge — its time_max equals the accumulated
# simulation time after step 60 to the last ULP, so the stop step is a
# bit-level f64 contract that only the CPU backend carries; the chip's
# double-single f64 emulation rounds the running time sum 1 ULP high
# and stops one step early).  A chip f64 regression in any transform
# route — incl. the rfold path that only N>=1024 exercises — fails the
# default invocation.  ~6 min on the chip, dominated by the N=2048
# full run (2040 steps).
DEFAULT_GOLDENS = ','.join([
    'n64_lcg_200', 'n128_uniform_300', 'n64_sobol_100',
    'n64_jitter_100', 'n64_sobol_jitter_100', 'n64_simplex_jitter_100',
    'n64_adaptive_400', 'n64_adaptive_floor_600', 'n64_adaptive_600',
    'n1024_lcg_60', 'n1024_uniform_stop', 'n2048_uniform_stop',
])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--transform', default=None,
                    help="force a transform route (e.g. ozaki, split, "
                         "matmul); default: the solver's auto choice")
    ap.add_argument('--goldens', default=DEFAULT_GOLDENS)
    ap.add_argument('--kernels', default=None,
                    choices=['xla', 'pallas'],
                    help="force the kernel backend")
    args = ap.parse_args()

    import jax
    import chsimpy_tpu as ct
    print(f"backend: {jax.default_backend()}")

    failures = 0
    for name in args.goldens.split(','):
        with open(os.path.join(GOLDEN_DIR, name + '.json')) as f:
            g = json.load(f)
        p = ct.Parameters()
        p.no_gui = True
        p.update_every = None
        for k, v in g['config'].items():
            setattr(p, k, v)
        if args.transform:
            p.transform_backend = args.transform
        if args.kernels:
            p.kernel_backend = args.kernels
        sim = ct.Simulator(p)
        sol = sim.solve()
        td = sol.timedata.data()
        ok_steps = (sol.computed_steps == g['computed_steps']
                    and len(td) == len(g['E']))
        ok_stop = sol.stop_reason == g['stop_reason']
        E = np.asarray(g['E'])
        n = min(len(td), len(E))
        erel = float(np.max(np.abs((td[:n, 1] - E[:n]) / E[:n])))
        delt_ref = np.asarray(g['delt'])[:n]
        drel = float(np.max(np.abs((td[:n, 8] - delt_ref) / delt_ref)))
        ok = (ok_steps and ok_stop
              and erel < RTOL_E.get(name, DEFAULT_RTOL_E))
        failures += 0 if ok else 1
        print(f"{name}: steps {'ok' if ok_steps else 'MISMATCH'} "
              f"stop={'ok' if ok_stop else sol.stop_reason} "
              f"Erel={erel:.2e} delt={drel:.2e} -> "
              f"{'PASS' if ok else 'FAIL'}")
    return 1 if failures else 0


if __name__ == '__main__':
    sys.exit(main())
