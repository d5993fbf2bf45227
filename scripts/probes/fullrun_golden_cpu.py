"""Measure CPU-backend replay error for the full-run goldens (N=1024/2048).

Used to pin the tolerances wired into tests/test_golden.py.  Run from the
repo root: python scripts/probes/fullrun_golden_cpu.py [names...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

if __name__ == '__main__':
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    import chsimpy_tpu as ct

    names = sys.argv[1:] or ['n1024_uniform_stop']
    gd = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      '..', '..', 'tests', 'golden')
    for name in names:
        with open(os.path.join(gd, name + '.json')) as f:
            g = json.load(f)
        p = ct.Parameters()
        p.no_gui = True
        p.update_every = None
        for k, v in g['config'].items():
            setattr(p, k, v)
        t = time.time()
        sol = ct.Simulator(p).solve()
        wall = time.time() - t
        td = sol.timedata.data()
        E = np.asarray(g['E'])
        n = min(len(td), len(E))
        erel = float(np.max(np.abs((td[:n, 1] - E[:n]) / E[:n])))
        e2 = np.asarray(g['E2'])
        e2rel = float(np.max(np.abs((td[:n, 2] - e2[:n]) / e2[:n])))
        drel = float(np.max(np.abs(
            (td[:n, 8] - np.asarray(g['delt'])[:n])
            / np.asarray(g['delt'])[:n])))
        usum = abs(float(np.sum(sol.U)) - g['U_sum']) / abs(g['U_sum'])
        print(f"{name}: steps {sol.computed_steps} (ref {g['computed_steps']})"
              f" stop={sol.stop_reason} (ref {g['stop_reason']})"
              f" tau0={sol.tau0} (ref {g['tau0']})"
              f" Erel={erel:.2e} E2rel={e2rel:.2e} delt={drel:.2e}"
              f" Usum_rel={usum:.2e} wall={wall:.0f}s", flush=True)
