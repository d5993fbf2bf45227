"""Phase decomposition of the canonical UQ experiment wall time (chip).

Phases: A-plan + member-constant setup (sympy kappa per member),
EnsembleSolver prepare+solve (device), per-member host pipeline
(export/render/postproc), aggregation."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))

if __name__ == '__main__':
    import tempfile
    import time

    import numpy as np

    from chsimpy_tpu import Parameters, material
    from chsimpy_tpu.ensemble import EnsembleSolver
    from chsimpy_tpu.experiment import (ExperimentParams, aggregate_results,
                                        export_member, generate_A_factors,
                                        postprocess_member)

    _os.chdir(tempfile.mkdtemp(prefix='uq_phase_'))
    p = Parameters()
    p.N = 512
    p.precision = 'float32'
    p.cinit = 0.89
    p.threshold = 0.89
    p.no_gui = True
    p.yaml = True
    p.export_csv = 'U, E, E2, SA'
    p.compress_csv = True
    p.file_id = 'ph'
    ep = ExperimentParams()
    ep.runs = 16
    ep.A_source = 'sobol'
    ep.A_seed = 85972

    t0 = time.time()
    rand_values = generate_A_factors(ep)
    A0b, A1b = p.func_A0(p.temp), p.func_A1(p.temp)
    A_pairs = np.stack([rand_values[:, 0] * A0b,
                        rand_values[:, 1] * A1b], axis=1)
    t1 = time.time()
    ens = EnsembleSolver(p, A_pairs)
    t2 = time.time()
    ens.prepare()
    sols = ens.solve_or_resume(p.ntmax)
    t3 = time.time()
    rows = []
    for i, sol in enumerate(sols):
        rp = p.deepcopy()
        rp.file_id = f'ph-run{i}'
        export_member(rp, sol, rp.file_id)
        rows.append(postprocess_member(rp, sol, i,
                                       rand_values[i, 0], rand_values[i, 1]))
    t4 = time.time()
    aggregate_results(rows, 'ph')
    t5 = time.time()
    print(f"A-plan           {t1 - t0:6.1f} s")
    print(f"EnsembleSolver() {t2 - t1:6.1f} s   (member kappa sympy)")
    print(f"prepare+solve    {t3 - t2:6.1f} s   (device)")
    print(f"host pipeline    {t4 - t3:6.1f} s   (export+postproc x16)")
    print(f"aggregate        {t5 - t4:6.1f} s")
