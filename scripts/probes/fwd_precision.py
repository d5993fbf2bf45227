"""Forward-transform precision experiment (chip).

The forward DCT's spectral image enters the update scaled by
Seig/CHeig (the semi-implicit damping), so its rounding error is far
less visible in U than the inverse's.  Measures, per fwd precision:

1. canonical N=512 f32 run — stop step + max rel E error vs the
   reference anchors (tests/golden/default_n512_anchors.json);
2. N=4096 f32 steady-state rate (bench.py protocol, best of 3).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))

if __name__ == '__main__':
    import json
    import time

    import numpy as np

    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    anchors = json.load(open(_os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)),
        '..', '..', 'tests', 'golden', 'default_n512_anchors.json')))
    E_ref = np.asarray(anchors['E_every_100'])

    def canonical(fwd):
        p = ct.Parameters()
        p.no_gui = True
        p.precision = 'float32'
        p.fwd_matmul_precision = fwd
        s = Solver(p)
        s.prepare()
        sol = s.solve_or_resume(p.ntmax)
        E = np.asarray(sol.E[:sol.computed_steps])
        n = min(len(E_ref), len(E[::100]))
        erel = float(np.max(np.abs(E[::100][:n] - E_ref[:n])
                            / np.abs(E_ref[:n])))
        return {'fwd': fwd or 'same', 'stop': int(sol.computed_steps),
                'tau0': float(sol.tau0), 'max_E_rel_vs_ref': erel}

    def rate4096(fwd):
        p = ct.Parameters()
        p.N = 4096
        p.ntmax = 256
        p.no_gui = True
        p.full_sim = True
        p.precision = 'float32'
        p.chunk_size = 1024
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.fwd_matmul_precision = fwd
        s = Solver(p)
        s.prepare()
        s.solve_or_resume(64)
        best = 0.0
        for _ in range(3):
            s.prepare()
            t0 = time.time()
            sol = s.solve_or_resume(256)
            best = max(best, (sol.computed_steps - 1) / (time.time() - t0))
        return {'fwd': fwd or 'same', 'steps_per_s': round(best, 1)}

    out = {'canonical_512': [], 'rate_4096': []}
    for fwd in (None, 'default'):
        r = canonical(fwd)
        print('canonical', r, flush=True)
        out['canonical_512'].append(r)
    for fwd in (None, 'default'):
        r = rate4096(fwd)
        print('rate', r, flush=True)
        out['rate_4096'].append(r)
    print(json.dumps(out))
