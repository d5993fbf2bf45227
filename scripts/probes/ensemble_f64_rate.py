"""On-chip vmapped-ensemble throughput in FLOAT64 validation mode
(N=512, the canonical UQ config): member-steps/s vs the reference's
one-process-per-core rate (34.47 steps/s/core at N=512 f64)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import json
import time
import numpy as np
import jax
import chsimpy_tpu as ct
from chsimpy_tpu import material
from chsimpy_tpu.ensemble import EnsembleSolver

assert jax.devices()[0].platform != 'cpu'
out = []
def batches(R):
    # the production protocol: float64 ozaki batches run four-wide
    # (PERFORMANCE.md round 4 — wider batches miscompile/serialize)
    return [(i, min(4, R - i)) for i in range(0, R, 4)]

for R in (1, 4, 16):
    p = ct.Parameters()
    p.N = 512
    p.precision = 'float64'
    p.no_gui = True
    p.full_sim = True
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4
    p.chunk_size = 256
    A0 = material.A0(p.temp)
    A1 = material.A1(p.temp)
    pairs = np.array([[A0 * (1 + 0.0005 * i), A1 * (1 - 0.0005 * i)]
                      for i in range(R)])
    enss = [EnsembleSolver(p, pairs[i:i + w]) for i, w in batches(R)]
    for ens in enss:
        ens.prepare()
        ens.solve_or_resume(257)  # compile + warm
    t0 = time.perf_counter()
    for ens in enss:
        ens.solve_or_resume(512)  # 2 chunks
    dt = time.perf_counter() - t0
    rate = 512.0 * R / dt
    row = {'R': R, 'member_steps_per_s': rate,
           'vs_ref_core': rate / 34.47}
    print(json.dumps(row), flush=True)
    out.append(row)
with open('artifacts/r4/ensemble_f64_chip.json', 'w') as f:
    json.dump(out, f, indent=1)
