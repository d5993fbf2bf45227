"""Round-5 attack on the f32 inverse-transform floor: banded precision.

(a) Accuracy: full N=2048 f32 runs (matmul route) with and without
    --inv-band N/4, E compared at every step to the reference f64 trace
    (tests/golden/n2048_uniform_stop.json) over the common prefix — the
    split-route baseline class there is 2.86e-6.
(b) Speed: N=4096 steady-state steps/s for matmul plain vs banded vs
    the split-route flagship.

Usage: python scripts/probes/inv_band_attack.py [accuracy|speed|both]
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


def base_params(ct, N, transform, inv_band=None):
    p = ct.Parameters()
    p.N = N
    p.precision = 'float32'
    p.no_gui = True
    p.update_every = None
    p.kappa_tilde = 2.98911291966116e-4
    p.transform_backend = transform
    p.inv_band = inv_band
    return p


def accuracy(ct, Solver, np):
    with open(GOLDEN) as f:
        g = json.load(f)
    E_ref = np.asarray(g['E'])
    out = {}
    for label, tr, band in (('matmul 3-pass', 'matmul', None),
                            ('matmul banded N/4', 'matmul', 512),
                            ('matmul banded N/8', 'matmul', 256)):
        p = base_params(ct, 2048, tr, band)
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
        dev = (stop - g['computed_steps']) / g['computed_steps']
        out[label] = {'E_max_rel_vs_f64': erel, 'stop': stop,
                      'stop_dev': dev, 'wall_s': wall}
        print(f"{label:20s} N=2048 full run: Emaxrel {erel:.3e} "
              f"stop {stop} ({dev:+.2%} vs ref 2040)  wall {wall:.0f}s",
              flush=True)
    return out


def speed(ct, Solver, np):
    out = {}
    for label, tr, band in (('split (flagship)', 'split', None),
                            ('matmul 3-pass', 'matmul', None),
                            ('matmul banded N/4', 'matmul', 1024)):
        p = base_params(ct, 4096, tr, band)
        p.ntmax = 1000000
        p.full_sim = True
        p.generator = 'lcg'
        p.chunk_size = 50
        s = Solver(p)
        s.prepare()
        s.solve_or_resume(51)           # warm + compile
        t = time.perf_counter()
        s.solve_or_resume(100)          # 2 chunks; the chunk driver
        wall = time.perf_counter() - t  # reads a scalar per chunk (sync)
        rate = 100 / wall
        out[label] = {'steps_per_s': rate}
        print(f"{label:20s} N=4096 f32: {rate:.1f} steps/s", flush=True)
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
    outp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        '..', '..', 'artifacts', 'r5',
                        'inv_band_attack.json')
    with open(outp, 'w') as f:
        json.dump(res, f, indent=1)
    print('->', os.path.normpath(outp))
