"""Single-chip memory ceiling: max N per precision + steps/s at the edge.

Runs 3 warm + 10 timed steps per config; records steps/s or the OOM
error.  v5e: 16 GB HBM."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import json
import time
import numpy as np
import jax
import chsimpy_tpu as ct
from chsimpy_tpu.core.solver import Solver

assert jax.devices()[0].platform != 'cpu'
out = []
for prec, Ns in (('float32', [8192, 16384, 32768]),
                 ('float64', [8192, 16384])):
    for N in Ns:
        p = ct.Parameters()
        p.N = N
        p.precision = prec
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.chunk_size = 10
        row = {'N': N, 'precision': prec}
        try:
            s = Solver(p)
            row['transform'] = s.cfg.transform_backend
            row['rfold'] = s.cfg.ozaki_rfold_levels
            row['split_levels'] = (s.cfg.split_levels_resolved
                                   if s.cfg.transform_backend == 'split'
                                   else None)
            s.prepare()
            s.solve_or_resume(4)   # compile + warm (3 steps after row0)
            t0 = time.perf_counter()
            s.solve_or_resume(10)
            dt = time.perf_counter() - t0
            row['steps_per_s'] = 10.0 / dt
            row['ms_per_step'] = dt * 100.0
        except Exception as e:
            msg = str(e)
            row['error'] = msg[:300]
            row['oom'] = ('RESOURCE_EXHAUSTED' in msg or 'memory' in
                          msg.lower())
        print(json.dumps(row), flush=True)
        out.append(row)
with open('artifacts/r4/mem_ceiling.json', 'w') as f:
    json.dump(out, f, indent=1)
