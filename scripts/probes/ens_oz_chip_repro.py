"""Chip repro of the vmapped f64 ozaki ensemble divergence: R=4 batch
vs 4 single runs, 20 steps, N=512 — where does the batch go wrong?"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import time
import numpy as np
import jax
import chsimpy_tpu as ct
from chsimpy_tpu import material
from chsimpy_tpu.ensemble import EnsembleSolver
from chsimpy_tpu.core.solver import Solver
from chsimpy_tpu.core.stepper import make_consts

assert jax.devices()[0].platform != 'cpu'

def params():
    p = ct.Parameters()
    p.N = 512
    p.precision = 'float64'
    p.no_gui = True
    p.full_sim = True
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4
    p.chunk_size = 20
    return p

p = params()
A0 = material.A0(p.temp)
A1 = material.A1(p.temp)
pairs = np.array([[A0 * (1 + 0.0005 * i), A1 * (1 - 0.0005 * i)]
                  for i in range(4)])
ens = EnsembleSolver(p, pairs)
print('cfg: fold=', ens.cfg.ozaki_fold, 'rfold=', ens.cfg.ozaki_rfold_levels,
      flush=True)
ens.prepare()
t0 = time.perf_counter()
sols = ens.solve_or_resume(20)
print('ens 20 steps (incl compile):', time.perf_counter() - t0, 's',
      flush=True)

for i, (a0, a1) in enumerate(pairs):
    s = Solver(params())
    s._consts = make_consts(s.cfg, s.delt, A0=a0, A1=a1,
                            kappa_tilde=ens.kappas[i])
    s.prepare()
    s.solve_or_resume(20)
    Ue = np.asarray(sols[i].U)
    Us = np.asarray(s.solution.U)
    dU = np.abs(Ue - Us).max()
    Ee = np.asarray(sols[i].timedata.E)
    Es = np.asarray(s.solution.timedata.E)
    with np.errstate(all='ignore'):
        dE = np.abs(Ee / Es - 1).max()
    print(f'member {i}: max|dU| {dU:.3e}  E rel {dE:.3e}  '
          f'nanU={np.isnan(Ue).any()}  nanE={np.isnan(Ee).any()}',
          flush=True)
