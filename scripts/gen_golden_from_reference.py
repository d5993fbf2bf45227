#!/usr/bin/env python
"""Generate golden-trace JSONs by running the REFERENCE implementation.

Usage:
    python scripts/gen_golden_from_reference.py <name> key=value ...
e.g.
    python scripts/gen_golden_from_reference.py n64_sobol_jitter_100 \
        N=64 ntmax=100 full_sim=True generator=sobol jitter=0.01

The reference at /root/reference needs two missing deps shimmed
(ruamel.yaml, opensimplex); the shims live in scripts/refshim/ (committed,
see its README).  The opensimplex shim is backed by
chsimpy_tpu.noise, which is equivalence-anchored against the package's
published algorithm — acceptable for goldens because the simplex field is
an *input* whose generation both sides must agree on, not solver output.

Output: tests/golden/<name>.json with the full timedata trace + field
checksums, the format consumed by tests/test_golden*.py.
"""

import ast
import json
import os
import sys

SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'refshim')
REF = '/root/reference'
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    name = sys.argv[1]
    cfg = {}
    for kv in sys.argv[2:]:
        k, v = kv.split('=', 1)
        try:
            cfg[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            cfg[k] = v

    sys.path.insert(0, SHIM)
    sys.path.insert(1, REF)
    import numpy as np
    from chsimpy.parameters import Parameters
    from chsimpy.simulator import Simulator

    p = Parameters()
    p.no_gui = True
    p.update_every = None
    for k, v in cfg.items():
        setattr(p, k, v)
    sim = Simulator(p)
    sol = sim.solve()
    td = sol.timedata

    out = {
        'config': cfg,
        'computed_steps': int(sol.computed_steps),
        'tau0': float(sol.tau0),
        't0': float(sol.t0),
        'stop_reason': str(sol.stop_reason),
        'it': np.asarray(td.it_range).tolist(),
        'E': np.asarray(td.E).tolist(),
        'E2': np.asarray(td.E2).tolist(),
        'SA': np.asarray(td.SA).tolist(),
        'delt': np.asarray(td.delt).tolist(),
        'U_sum': float(np.sum(sol.U)),
        'U_corner': np.asarray(sol.U[:2, :2]).tolist(),
        'time_delta_sum': float(sim.solver.time_delta_sum),
        'time_passed': float(sim.solver.time_passed),
    }
    path = os.path.join(REPO, 'tests', 'golden', name + '.json')
    with open(path, 'w') as f:
        json.dump(out, f)
    print(f"wrote {path}: {out['computed_steps']} steps, "
          f"stop={out['stop_reason']}, E[-1]={out['E'][-1]:.12e}")


if __name__ == '__main__':
    main()
