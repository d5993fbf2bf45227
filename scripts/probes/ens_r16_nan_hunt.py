"""Hunt the R=16 f64 ensemble NaN: which batch size, member, step?"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import json
import numpy as np
import jax
import chsimpy_tpu as ct
from chsimpy_tpu import material
from chsimpy_tpu.ensemble import EnsembleSolver

assert jax.devices()[0].platform != 'cpu'

def run(R, steps=768, chunk=64):
    p = ct.Parameters()
    p.N = 512
    p.precision = 'float64'
    p.no_gui = True
    p.full_sim = True
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4
    p.chunk_size = chunk
    A0 = material.A0(p.temp)
    A1 = material.A1(p.temp)
    pairs = np.array([[A0 * (1 + 0.0005 * i), A1 * (1 - 0.0005 * i)]
                      for i in range(R)])
    ens = EnsembleSolver(p, pairs)
    ens.prepare()
    done = 0
    try:
        while done < steps:
            ens.solve_or_resume(chunk)
            done += chunk
            stops = [str(s) for s in np.asarray(ens._stop)] \
                if ens._stop is not None else None
        print(f'R={R}: OK {done} steps', flush=True)
    except FloatingPointError:
        U = np.asarray(ens._host_leaves(ens._states.U)[0])
        steps_arr = np.asarray(
            ens._host_leaves(ens._states.computed_steps)[0])
        bad = [i for i in range(R) if np.isnan(U[i]).any()
               or np.abs(U[i]).max() > 10]
        print(f'R={R}: NaN after ~{done + chunk} steps; '
              f'bad members {bad}; steps {steps_arr.tolist()}; '
              f'U maxabs per member '
              f'{[float(np.nanmax(np.abs(U[i]))) for i in range(R)]}',
              flush=True)

for R in (8, 12, 16):
    run(R)
