"""f64 N=8192 single-chip variants: find one that fits + its rate."""
import json
import time
import numpy as np
import jax
import chsimpy_tpu as ct
from chsimpy_tpu.core import solver as solver_mod
from chsimpy_tpu.core.solver import Solver

assert jax.devices()[0].platform != 'cpu'
out = []

def probe(tag, rfold, transform='ozaki'):
    orig = solver_mod._resolve_rfold_levels
    solver_mod._resolve_rfold_levels = lambda p, grid_sharded=None: rfold
    try:
        p = ct.Parameters()
        p.N = 8192
        p.precision = 'float64'
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.transform_backend = transform
        p.chunk_size = 5
        row = {'variant': tag}
        try:
            s = Solver(p)
            row['rfold'] = s.cfg.ozaki_rfold_levels
            row['fold'] = s.cfg.ozaki_fold
            s.prepare()
            s.solve_or_resume(3)
            t0 = time.perf_counter()
            s.solve_or_resume(5)
            dt = time.perf_counter() - t0
            row['steps_per_s'] = 5.0 / dt
        except Exception as e:
            msg = str(e)
            row['error'] = msg[:200]
        print(json.dumps(row), flush=True)
        out.append(row)
    finally:
        solver_mod._resolve_rfold_levels = orig

probe('ozaki-rfold1', 1)
probe('ozaki-fold1-natural', 0)
with open('artifacts/r4/mem_f64_8192.json', 'w') as f:
    json.dump(out, f, indent=1)
