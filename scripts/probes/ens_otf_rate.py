"""Vmapped-ensemble rate with the on-the-fly coefficient rebuild.

Ensembles batch CHeig per member (kappa differs), so the stored-grid
route reads R x N^2 of coefficients every step — at N=512 R=16 f32
that's ~16 MB/step, ~16% of the batch's field traffic.  The otf rebuild
(pin `otf_coeffs=1`; kappa rides as the batched scalar it already is)
drops those reads.  Protocol: the r3 ensemble capture protocol (lcg,
full_sim, N=512 x R=16, 512 timed steps after warm).

Run: python scripts/probes/ens_otf_rate.py
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
    from chsimpy_tpu.ensemble import EnsembleSolver

    def rate(otf):
        p = ct.Parameters()
        p.N = 512
        p.precision = 'float32'
        p.no_gui = True
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.otf_coeffs = otf
        R = 16
        A0, A1 = p.func_A0(p.temp), p.func_A1(p.temp)
        pairs = np.stack([np.linspace(0.995, 1.005, R) * A0,
                          np.linspace(1.005, 0.995, R) * A1], axis=1)
        ens = EnsembleSolver(p, pairs)
        ens.prepare()
        ens.solve_or_resume(1025)            # warm incl compile
        t = time.perf_counter()
        ens.solve_or_resume(1024)
        wall = time.perf_counter() - t
        return R * 1024 / wall

    out = {}
    for label, otf in (('stored CHeig batch', 0), ('otf rebuild', 1)):
        r = rate(otf)
        out[label] = {'member_steps_per_s': r}
        print(f"{label:18s} N=512 R=16: {r:.0f} member-steps/s",
              flush=True)
    dst = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        '..', '..', 'artifacts', 'r5', 'ens_otf_rate.json')
    with open(dst, 'w') as f:
        json.dump(out, f, indent=1)
    print('->', _os.path.normpath(dst))
