"""f64 N=512 ozaki variants on the chip (the canonical validation
config's transform): rate + exact-stop gate per variant."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import json
import time
import numpy as np
import jax
import chsimpy_tpu as ct
from chsimpy_tpu.core import solver as solver_mod
from chsimpy_tpu.core.solver import Solver

assert jax.devices()[0].platform != 'cpu'
out = []

def probe(tag, rfold):
    orig = solver_mod._resolve_rfold_levels
    solver_mod._resolve_rfold_levels = lambda p, grid_sharded=None: rfold
    try:
        p = ct.Parameters()
        p.N = 512
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.chunk_size = 200
        row = {'variant': tag, 'rfold': rfold}
        s = Solver(p)
        s.prepare()
        s.solve_or_resume(201)
        t0 = time.perf_counter()
        s.solve_or_resume(400)
        dt = time.perf_counter() - t0
        row['steps_per_s'] = 400.0 / dt
        print(json.dumps(row), flush=True)
        out.append(row)
    finally:
        solver_mod._resolve_rfold_levels = orig

probe('fold1-natural (current default)', 0)
probe('rfold1', 1)
probe('rfold2', 2)
probe('rfold3', 3)
with open('artifacts/r4/f64_512_sweep.json', 'w') as f:
    json.dump(out, f, indent=1)
