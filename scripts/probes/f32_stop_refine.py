"""Measure the round-3 'capped-cost mitigation' hypothesis: run the
canonical config in f32 to step ~1610 (before the ~1669-1674 stop
window), hand the state to an f64 solver, and see where the f64 tail
stops.  If the f32 trajectory noise is concentrated near onset, the
tail recovers the reference's exact 1674; if (as PERFORMANCE.md round 3
concluded) it is accumulated over the whole run, it won't."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import json
import numpy as np
import jax
import chsimpy_tpu as ct
from chsimpy_tpu.checkpoint import save_checkpoint, load_checkpoint
from chsimpy_tpu.core.solver import Solver

assert jax.devices()[0].platform != 'cpu'

CUT = 1610

p32 = ct.Parameters()
p32.precision = 'float32'
p32.no_gui = True
p32.update_every = None
s32 = Solver(p32)
s32.prepare()
s32.solve_or_resume(CUT)
f = '/tmp/f32_refine.ckpt.npz'
save_checkpoint(f, s32)
print('f32 prefix done at', s32.solution.computed_steps, flush=True)

# f32 control: where does pure f32 stop?
s32.solve_or_resume(200)
stop32 = s32.solution.computed_steps
print('pure f32 stop:', stop32, s32.solution.stop_reason, flush=True)

# f64 tail from the f32 state
params, payload = load_checkpoint(f)
params.precision = 'float64'
from chsimpy_tpu import checkpoint as ckpt_mod
import jax.numpy as jnp
from chsimpy_tpu.timedata import TimeData
solver = Solver(params, U_init=payload['U_init'])
h = payload['header']
solver.skip_check = h['skip_check']
solver.time_delta_sum = h['time_delta_sum']
solver.time_passed = h['time_delta_sum'] / params.M_tilde
solver.delt = h['delt']
solver.prepare()
td = TimeData()
td.insert_block(payload['timedata'])
sol = solver.solution
sol.timedata = td
sol.computed_steps = h['computed_steps']
rows = payload['timedata']
state = solver._state.replace(
    U=solver._field_state(payload['U']),
    delt=jnp.asarray(h['delt'], jnp.float64),
    time_delta_sum=jnp.asarray(h['time_delta_sum'], jnp.float64),
    computed_steps=jnp.asarray(h['computed_steps'], jnp.int32),
    skip_check=jnp.asarray(bool(h['skip_check'])),
    E2_first=jnp.asarray(rows[0, 2], jnp.float64),
    E2_prev=jnp.asarray(rows[-1, 2], jnp.float64),
)
solver._state = state
sol2 = solver.solve_or_resume(200)
print('f64-tail stop:', sol2.computed_steps, sol2.stop_reason, flush=True)
out = {'cut_step': CUT, 'pure_f32_stop': int(stop32),
       'f64_tail_stop': int(sol2.computed_steps),
       'reference_stop': 1674}
print(json.dumps(out))
with open('artifacts/r4/f32_stop_refine.json', 'w') as fo:
    json.dump(out, fo, indent=1)
