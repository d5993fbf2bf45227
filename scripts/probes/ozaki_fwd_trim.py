"""Forward-trimmed ozaki cutoffs: canonical f64 gates + N=4096 rate."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import json
    import time

    import numpy as np

    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    anchors = json.load(open(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        '..', '..', 'tests', 'golden', 'default_n512_anchors.json')))
    E_ref = np.asarray(anchors['E_every_100'])

    def canonical(pairs):
        p = ct.Parameters()
        p.no_gui = True
        p.precision = 'float64'
        p.ozaki_fwd_pairs = pairs
        s = Solver(p)
        s.prepare()
        t0 = time.time()
        sol = s.solve_or_resume(p.ntmax)
        wall = time.time() - t0
        E = np.asarray(sol.E[:sol.computed_steps])
        n = min(len(E_ref), len(E[::100]))
        erel = float(np.max(np.abs(E[::100][:n] - E_ref[:n])
                            / np.abs(E_ref[:n])))
        print({'pairs': pairs or '(5,7)', 'stop': int(sol.computed_steps),
               'tau0': float(sol.tau0), 'max_E_rel': erel,
               'wall_s': round(wall, 1)}, flush=True)
        return int(sol.computed_steps)

    def rate4096(pairs):
        p = ct.Parameters()
        p.N = 4096
        p.ntmax = 128
        p.no_gui = True
        p.full_sim = True
        p.precision = 'float64'
        p.chunk_size = 1024
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.ozaki_fwd_pairs = pairs
        s = Solver(p)
        s.prepare()
        s.solve_or_resume(16)
        best = 0.0
        for _ in range(3):
            s.prepare()
            t0 = time.time()
            sol = s.solve_or_resume(128)
            best = max(best, (sol.computed_steps - 1) / (time.time() - t0))
        print({'pairs': pairs or '(5,7)', 'steps_per_s': round(best, 2)},
              flush=True)

    import sys as _s
    sel = _s.argv[1] if len(_s.argv) > 1 else 'main'
    table = {'main': (None, (4, 6), (3, 5)),
             'edge': ((3, 4), (2, 4), (2, 3))}[sel]
    for pairs in table:
        canonical(pairs)
    for pairs in table:
        rate4096(pairs)
