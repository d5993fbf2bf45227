"""Steady-state f32 rates at N=8192/16384 (chunk 1024, the solver's
production protocol) — replaces the short-chunk probe numbers."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import json
import time
import jax
import chsimpy_tpu as ct
from chsimpy_tpu.core.solver import Solver

assert jax.devices()[0].platform != 'cpu'
out = []
for N, warm, timed in ((8192, 60, 200), (16384, 20, 60)):
    p = ct.Parameters()
    p.N = N
    p.precision = 'float32'
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4
    p.chunk_size = 1024
    s = Solver(p)
    s.prepare()
    s.solve_or_resume(warm)
    t0 = time.perf_counter()
    s.solve_or_resume(timed)
    dt = time.perf_counter() - t0
    row = {'N': N, 'steps_per_s': timed / dt, 'ms_per_step': dt / timed * 1e3,
           'split_levels': s.cfg.split_levels_resolved,
           'fold_field': s.cfg.fold_field}
    print(json.dumps(row), flush=True)
    out.append(row)
with open('artifacts/r4/f32_large_steady.json', 'w') as f:
    json.dump(out, f, indent=1)
