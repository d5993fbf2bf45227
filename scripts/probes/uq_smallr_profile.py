"""Fine-grained phase profile of the canonical R=16 UQ experiment (chip).

Round-4 closed at 13.3 s end-to-end with ~4 s of fixed overhead left
(ctor/prepare + A-plan + first-batch dispatch).  This probe splits that
overhead into attributable pieces so it can be cut or documented as the
floor (VERDICT r4 item 8).

Run: python scripts/probes/uq_smallr_profile.py [R]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))

if __name__ == '__main__':
    import json
    import tempfile
    import time

    t_import0 = time.time()
    import numpy as np

    import chsimpy_tpu as ct
    from chsimpy_tpu.ensemble import EnsembleSolver
    from chsimpy_tpu.experiment import (ExperimentParams, HostPipeline,
                                        aggregate_results,
                                        generate_A_factors,
                                        run_experiment_batch)
    import jax
    t_import = time.time() - t_import0

    R = int(_sys.argv[1]) if len(_sys.argv) > 1 else 16
    out_json = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             '..', '..', 'artifacts', 'r5',
                             'uq_smallr_profile.json')
    _os.chdir(tempfile.mkdtemp(prefix='uq_smallr_'))

    def canon_params():
        p = ct.Parameters()
        p.N = 512
        p.precision = 'float32'
        p.cinit = 0.89
        p.threshold = 0.89
        p.no_gui = True
        p.yaml = True
        p.export_csv = 'U, E, E2, SA'
        p.compress_csv = True
        p.file_id = 'prof'
        p.kappa_tilde = 2.98911291966116e-4  # canonical value: the real
        # experiment solves member kappas in the host pool (measured
        # separately below)
        return p

    # --- backend init (first device touch) ---
    t0 = time.time()
    jax.devices()
    t_backend = time.time() - t0

    p = canon_params()
    ep = ExperimentParams()
    ep.runs = R
    ep.A_source = 'sobol'
    ep.A_seed = 85972

    t0 = time.time()
    rand_values = generate_A_factors(ep)
    A0b, A1b = p.func_A0(p.temp), p.func_A1(p.temp)
    A_pairs = np.stack([rand_values[:, 0] * A0b,
                        rand_values[:, 1] * A1b], axis=1)
    t_aplan = time.time() - t0

    t0 = time.time()
    ens = EnsembleSolver(p, A_pairs)
    t_ctor = time.time() - t0

    t0 = time.time()
    ens.prepare()
    t_prepare = time.time() - t0

    # first chunk = compile-or-cache-load + dispatch; rest = steady solve
    t0 = time.time()
    ens.solve_or_resume(2)
    t_first = time.time() - t0
    t0 = time.time()
    ens.solve_or_resume(p.ntmax)
    t_solve = time.time() - t0

    t0 = time.time()
    sols = ens.solutions()
    t_pull = time.time() - t0

    sink = HostPipeline(-1)
    t0 = time.time()
    for i, sol in enumerate(sols):
        rp = p.deepcopy()
        rp.file_id = f'prof-run{i}'
        sink.submit(rp, sol, i, rand_values[i, 0], rand_values[i, 1])
    rows = sink.drain()
    sink.close()
    t_host = time.time() - t0

    t0 = time.time()
    aggregate_results(rows, 'prof')
    t_agg = time.time() - t0

    # end-to-end of the REAL driver for reference (fresh solver state,
    # same process — cache warm)
    t0 = time.time()
    p2 = canon_params()
    p2.file_id = 'prof2'
    ep2 = ExperimentParams()
    ep2.runs = R
    ep2.A_source = 'sobol'
    ep2.A_seed = 85972
    rows2 = run_experiment_batch(p2, ep2, progress=False)
    aggregate_results(rows2, 'prof2')
    t_e2e_warm = time.time() - t0

    prof = {
        'R': R,
        'import_s': t_import,
        'backend_init_s': t_backend,
        'a_plan_s': t_aplan,
        'ctor_s': t_ctor,
        'prepare_s': t_prepare,
        'first_chunk_s': t_first,
        'device_solve_s': t_solve,
        'solution_pull_s': t_pull,
        'host_pipeline_s': t_host,
        'aggregate_s': t_agg,
        'sum_phases_s': (t_aplan + t_ctor + t_prepare + t_first + t_solve
                         + t_pull + t_host + t_agg),
        'e2e_warm_same_process_s': t_e2e_warm,
    }
    for k, v in prof.items():
        if k != 'R':
            print(f"{k:26s} {v:7.2f}", flush=True)
    with open(out_json, 'w') as f:
        json.dump(prof, f, indent=1)
    print('->', _os.path.normpath(out_json))
