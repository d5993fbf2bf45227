"""Adjudicate the "bf16-stored spectral state" roofline candidate.

hat_U is read + written every step (2F = 134 MB at N=4096); bf16
storage halves that on the HBM-bound f32 step.  Unlike the banded
inverse (which rounds only the DAMPED high-k tail of a transient),
bf16 storage rounds the carried state itself — a real trajectory
perturbation (measured: U diverges like any sub-noise seed change in
this chaotic system), so the acceptance test is the same one every f32
fast-mode feature passes: the E trace vs the f64 reference and the
stop step, full N=2048 run.

VERDICT (chip, artifacts/r5/spectral_bf16_probe.{json,log}): DUAL
NEGATIVE.  Speed: 286.5 vs 286.8 steps/s at N=4096, 36.2 vs 35.6 at
8192 — the hoped-for 0.08 ms of HBM savings never shows (the per-step
bf16<->f32 converts cost what the bytes save).  Accuracy: the carried-
state rounding COMPOUNDS through the recurrence — stop 2060 -> 2548
(+24.9%), E max rel 3.4e-6 -> 1.9e-5.  (An earlier round-trip-cast
variant of this probe read benign on chip; that reading was a stale-
program artifact — f32(bf16(x)) carried in f32 and a promoted bf16
carry are the same values, and the CPU backend shows the same
divergence growth for both.  This version stores the real dtype and
is authoritative.)  The knob stays probe-only.

Run: python scripts/probes/spectral_bf16_probe.py [accuracy|speed|both]
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


def params(ct, N, bf16, chunk=1024):
    p = ct.Parameters()
    p.N = N
    p.precision = 'float32'
    p.no_gui = True
    p.update_every = None
    p.kappa_tilde = 2.98911291966116e-4
    p.transform_backend = 'split'
    p.spectral_bf16 = bf16
    p.chunk_size = chunk
    return p


def accuracy(ct, Solver, np):
    with open(GOLDEN) as f:
        g = json.load(f)
    E_ref = np.asarray(g['E'])
    out = {}
    for label, bf in (('f32 state', False), ('bf16 state', True)):
        p = params(ct, 2048, bf)
        p.ntmax = 4000
        s = Solver(p)
        s.prepare()
        sol = s.solve_or_resume(p.ntmax)
        E = np.asarray(sol.E)
        n = min(len(E), len(E_ref))
        erel = float(np.max(np.abs(E[:n] / E_ref[:n] - 1.0)))
        stop = int(sol.computed_steps)
        out[label] = {'E_max_rel_vs_f64': erel, 'stop': stop}
        print(f"{label:10s} N=2048 full run: Emaxrel {erel:.3e} stop "
              f"{stop} ({(stop - 2040) / 2040:+.2%})", flush=True)
    return out


def speed(ct, Solver, np):
    out = {}
    for N in (4096, 8192):
        for label, bf in (('f32 state', False), ('bf16 state', True)):
            p = params(ct, N, bf)
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
            print(f"{label:10s} N={N}: {rate:.1f} steps/s "
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
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       '..', '..', 'artifacts', 'r5',
                       'spectral_bf16_probe.json')
    with open(dst, 'w') as f:
        json.dump(res, f, indent=1)
    print('->', os.path.normpath(dst))
