"""f64 N=4096 full-solver step rate on the chip: rfold2 (new auto) vs
the level-1 fold (forced via ozaki_rfold_levels=0 path by pinning N<1024
rule? no — construct StepConfig directly through Solver params)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import time
import numpy as np
import jax
import chsimpy_tpu as ct
from chsimpy_tpu.core.solver import Solver

assert jax.devices()[0].platform != 'cpu'

def rate(**kw):
    p = ct.Parameters()
    p.N = 4096
    p.precision = 'float64'
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4
    p.chunk_size = 50
    for k, v in kw.items():
        setattr(p, k, v)
    s = Solver(p)
    print('cfg: rfold_levels=', s.cfg.ozaki_rfold_levels,
          'fold=', s.cfg.ozaki_fold, 'kb=', s.cfg.kernel_backend, flush=True)
    s.prepare()
    s.solve_or_resume(51)   # compile + warm
    t0 = time.perf_counter()
    s.solve_or_resume(100)  # 2 chunks
    dt = time.perf_counter() - t0
    print('steps/s:', 100.0 / dt, f'({dt*10:.1f} ms/step)', flush=True)
    return s

s = rate()                      # new default: rfold2
