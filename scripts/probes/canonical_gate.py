"""Canonical N=512 f64 default-config run on the chip: exact stop step."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import numpy as np
import jax
import chsimpy_tpu as ct

assert jax.devices()[0].platform != 'cpu'
p = ct.Parameters()
p.no_gui = True
p.update_every = None
sim = ct.Simulator(p)
sol = sim.solve()
print('stop_reason', sol.stop_reason, 'steps', sol.computed_steps,
      'tau0', sol.tau0, 't0', sol.t0)
assert sol.stop_reason == 'energy' and sol.computed_steps == 1674, \
    (sol.stop_reason, sol.computed_steps)
print('CANONICAL GATE PASS')
