"""Banded inverse inside the SPLIT route (the f32 flagship) — chip A/B.

(a) Accuracy: full N=2048 f32 split runs, E vs the reference f64 trace
    (golden n2048_uniform_stop), banded off / N/4 / N/8.
(b) Speed: N=4096 steady state at chunk 1024 (the official bench
    protocol — chunk 50 is tunnel-latency-bound), split plain vs banded.

Usage: python scripts/probes/inv_band_split.py [accuracy|speed|both]
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


def params(ct, N, inv_band, chunk=1024):
    p = ct.Parameters()
    p.N = N
    p.precision = 'float32'
    p.no_gui = True
    p.update_every = None
    p.kappa_tilde = 2.98911291966116e-4
    p.transform_backend = 'split'
    p.inv_band = inv_band
    p.chunk_size = chunk
    return p


def accuracy(ct, Solver, np):
    with open(GOLDEN) as f:
        g = json.load(f)
    E_ref = np.asarray(g['E'])
    out = {}
    for label, band in (('split 3-pass', None),
                        ('split banded N/4', 512),
                        ('split banded N/8', 256)):
        p = params(ct, 2048, band)
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
        print(f"{label:18s} N=2048 full run: Emaxrel {erel:.3e} stop "
              f"{stop} ({(stop - 2040) / 2040:+.2%})  wall {wall:.0f}s",
              flush=True)
    return out


def speed(ct, Solver, np):
    out = {}
    for N in (2048, 4096):
        for label, band in (('split 3-pass', None),
                            ('split banded N/4', N // 4)):
            p = params(ct, N, band)
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
            print(f"{label:18s} N={N}: {rate:.1f} steps/s "
                  f"({1000 * wall / 1024:.2f} ms/step)", flush=True)
    return out


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'both'
    import numpy as np

    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver
    res = {}
    if mode in ('accuracy', 'both'):
        res['accuracy'] = accuracy(ct, Solver, np)
    if mode in ('speed', 'both'):
        res['speed'] = speed(ct, Solver, np)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       '..', '..', 'artifacts', 'r5',
                       'inv_band_split.json')
    with open(out, 'w') as f:
        json.dump(res, f, indent=1)
    print('->', os.path.normpath(out))
