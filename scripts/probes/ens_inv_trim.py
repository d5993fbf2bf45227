"""Trimmed ozaki inverse under the width-4 vmapped rfold (f64 ensembles).

The single-run rfold inverse trim (3, 5) passed the full contract
(scripts/probes/ozaki_inv_trim.py); f64 ensembles run the same rfold
program vmapped four-wide (the measured chip optimum).  Two checks
before enabling it there:

(a) exactness: a pinned R=4 ensemble must stay BIT-equal to 4 pinned
    single runs (the existing vmapped-f64 equality class);
(b) rate: R=4 N=512 f64 capture protocol, pin None vs (3, 5).

Run: python scripts/probes/ens_inv_trim.py
"""
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))

if __name__ == '__main__':
    import json

    import numpy as np

    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver
    from chsimpy_tpu.ensemble import EnsembleSolver

    def base_params(pin):
        p = ct.Parameters()
        p.N = 512
        p.precision = 'float64'
        p.no_gui = True
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.ozaki_inv_pairs = pin
        return p

    out = {}

    # (a) bit-equality: pinned ensemble vs pinned single runs, 200 steps
    p = base_params((3, 5))
    p.ntmax = 200
    A0, A1 = p.func_A0(p.temp), p.func_A1(p.temp)
    pairs = np.stack([np.linspace(0.997, 1.003, 4) * A0,
                      np.linspace(1.003, 0.997, 4) * A1], axis=1)
    ens = EnsembleSolver(p, pairs)
    ens.prepare()
    sols = ens.solve_or_resume(200)
    max_abs = 0.0
    for i, sol in enumerate(sols):
        sp = base_params((3, 5))
        sp.ntmax = 200
        sp.A0_const = pairs[i, 0]
        sp.A1_const = pairs[i, 1]
        s = Solver(sp)
        s.prepare()
        ssol = s.solve_or_resume(200)
        d = float(np.max(np.abs(
            np.asarray(sol.timedata.data()[:, 1])
            - np.asarray(ssol.timedata.data()[:, 1]))))
        max_abs = max(max_abs, d)
    out['bit_equality_E_max_abs'] = max_abs
    print(f"pinned ens vs singles: E max abs diff {max_abs:.3e} "
          f"({'BIT-EQUAL' if max_abs == 0.0 else 'DIFFERS'})",
          flush=True)

    # (b) rate
    for label, pin in (('inv (5,7)', (5, 7)), ('inv (3,5)', (3, 5))):
        p = base_params(pin)
        p.ntmax = 10 ** 6
        ens = EnsembleSolver(p, pairs)
        ens.prepare()
        ens.solve_or_resume(513)
        t = time.perf_counter()
        ens.solve_or_resume(512)
        wall = time.perf_counter() - t
        r = 4 * 512 / wall
        out[label] = {'member_steps_per_s': r}
        print(f"{label:10s} R=4 N=512 f64: {r:.0f} member-steps/s",
              flush=True)

    dst = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        '..', '..', 'artifacts', 'r5', 'ens_inv_trim.json')
    with open(dst, 'w') as f:
        json.dump(out, f, indent=1)
    print('->', _os.path.normpath(dst))
