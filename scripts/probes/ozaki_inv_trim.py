"""Trimmed pair cutoffs for the f64 ozaki INVERSE — contract + speed.

The forward transform runs (3, 5) pairs because the semi-implicit
damping shields its spectral image; the inverse has NO shield — its
output IS the field — so any trim must survive the full 1e-10 E
contract including the early flat-spectrum steps (the IC noise is
broadband, so the high-k content the trim degrades is NOT tiny there).

(a) Contract: replay the n1024_uniform_stop golden (1837 steps to the
    energy stop, rfold production path) with inverse pairs (5,7) /
    (4,6) / (3,5): exact stop + E max rel vs the reference trace.
(b) Speed: N=4096 f64 steady state (chunk 128, the f64 protocol).

Run: python scripts/probes/ozaki_inv_trim.py [contract|speed|both]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      '..', '..', 'tests', 'golden',
                      'n1024_uniform_stop.json')


def contract(ct, np):
    with open(GOLDEN) as f:
        g = json.load(f)
    E_ref = np.asarray(g['E'])
    out = {}
    # full margin sweep: the cliff sits at (2, 3), like the forward's
    for pairs in (None, (4, 6), (3, 5), (2, 4), (2, 3), (1, 2)):
        label = f"inv {pairs or (5, 7)}"
        p = ct.Parameters()
        p.no_gui = True
        p.update_every = None
        for k, v in g['config'].items():
            setattr(p, k, v)
        p.ozaki_inv_pairs = pairs
        sim = ct.Simulator(p)
        sol = sim.solve()
        td = sol.timedata.data()
        n = min(len(td), len(E_ref))
        erel = float(np.max(np.abs((td[:n, 1] - E_ref[:n]) / E_ref[:n])))
        stop = int(sol.computed_steps)
        ok = stop == g['computed_steps'] and erel < 1e-10
        out[label] = {'E_max_rel': erel, 'stop': stop,
                      'contract_pass': ok}
        print(f"{label:12s} N=1024 full run: Emaxrel {erel:.3e} stop "
              f"{stop} (ref {g['computed_steps']}) -> "
              f"{'PASS' if ok else 'FAIL'}", flush=True)
    return out


def speed(ct, np):
    from chsimpy_tpu.core.solver import Solver
    out = {}
    for pairs in (None, (4, 6), (3, 5)):
        label = f"inv {pairs or (5, 7)}"
        p = ct.Parameters()
        p.N = 4096
        p.precision = 'float64'
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.chunk_size = 128
        p.ozaki_inv_pairs = pairs
        s = Solver(p)
        s.prepare()
        s.solve_or_resume(129)              # warm incl compile
        t = time.perf_counter()
        s.solve_or_resume(128)
        wall = time.perf_counter() - t
        out[f'{label} N=4096'] = {'steps_per_s': 128 / wall}
        print(f"{label:12s} N=4096 f64: {128 / wall:.2f} steps/s "
              f"({1000 * wall / 128:.1f} ms/step)", flush=True)
    return out


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'both'
    import numpy as np

    import chsimpy_tpu as ct
    res = {}
    if mode in ('speed', 'both'):
        res['speed'] = speed(ct, np)
    if mode in ('contract', 'both'):
        res['contract'] = contract(ct, np)
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       '..', '..', 'artifacts', 'r5', 'ozaki_inv_trim.json')
    with open(dst, 'w') as f:
        json.dump(res, f, indent=1)
    print('->', os.path.normpath(dst))
