"""On-the-fly Seig/CHeig rebuild (otf_coeffs) — chip A/B.

The round-5 roofline puts the f32 split step HBM-bound at N>=4096;
streaming the two precomputed (N, N) coefficient grids is 2 full-field
reads per step.  get_coefficients_axis rebuilds them inside the update's
fused elementwise op from the (N,) eigenvalue axis (~5 VPU flops/elt).

(a) Accuracy: full N=2048 f32 split run vs the reference f64 trace
    (golden n2048_uniform_stop), otf off vs on.
(b) Speed: steady state at chunk 1024 (official protocol), N=2048/4096/
    8192, otf off vs on (banded inverse stays at its resolved default
    both ways).

Usage: python scripts/probes/otf_coeffs_ab.py [accuracy|speed|both]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      '..', '..', 'tests', 'golden',
                      'n2048_uniform_stop.json')


def params(ct, N, otf, chunk=1024):
    p = ct.Parameters()
    p.N = N
    p.precision = 'float32'
    p.no_gui = True
    p.update_every = None
    p.kappa_tilde = 2.98911291966116e-4
    p.transform_backend = 'split'
    p.otf_coeffs = otf
    p.chunk_size = chunk
    return p


def accuracy(ct, Solver, np):
    with open(GOLDEN) as f:
        g = json.load(f)
    E_ref = np.asarray(g['E'])
    out = {}
    for label, otf in (('stored grids', 0), ('otf rebuild', 1)):
        p = params(ct, 2048, otf)
        p.ntmax = 4000
        s = Solver(p)
        s.prepare()
        t = time.time()
        sol = s.solve_or_resume(p.ntmax)
        wall = time.time() - t
        E = np.asarray(sol.E)
        n = min(len(E), len(E_ref))
        erel = float(np.max(np.abs(E[:n] / E_ref[:n] - 1.0)))
        stop = int(sol.computed_steps)
        out[label] = {'E_max_rel_vs_f64': erel, 'stop': stop,
                      'wall_s': wall}
        print(f"{label:14s} N=2048 full run: Emaxrel {erel:.3e} stop "
              f"{stop} ({(stop - 2040) / 2040:+.2%})  wall {wall:.0f}s",
              flush=True)
    return out


def speed(ct, Solver, np):
    out = {}
    for N in (2048, 4096, 8192):
        for label, otf in (('stored grids', 0), ('otf rebuild', 1)):
            p = params(ct, N, otf)
            p.ntmax = 1000000
            p.full_sim = True
            p.generator = 'lcg'
            s = Solver(p)
            s.prepare()
            s.solve_or_resume(1025)          # warm: 2 chunks incl compile
            t = time.perf_counter()
            s.solve_or_resume(1024)
            wall = time.perf_counter() - t
            rate = 1024 / wall
            out[f'{label} N={N}'] = {'steps_per_s': rate}
            print(f"{label:14s} N={N}: {rate:.1f} steps/s "
                  f"({1000 * wall / 1024:.2f} ms/step)", flush=True)
    return out


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'both'
    import numpy as np

    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver
    res = {}
    if mode in ('speed', 'both'):
        res['speed'] = speed(ct, Solver, np)
    if mode in ('accuracy', 'both'):
        res['accuracy'] = accuracy(ct, Solver, np)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       '..', '..', 'artifacts', 'r5',
                       'otf_coeffs_ab.json')
    with open(out, 'w') as f:
        json.dump(res, f, indent=1)
    print('->', os.path.normpath(out))
