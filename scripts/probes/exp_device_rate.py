import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import time
    import numpy as np
    from chsimpy_tpu import Parameters
    from chsimpy_tpu.ensemble import EnsembleSolver
    from chsimpy_tpu.experiment import generate_A_factors, ExperimentParams, _member_kappas, HostPipeline
    p = Parameters(); p.N = 512; p.precision = 'float32'; p.cinit = 0.89; p.threshold = 0.89
    p.no_gui = True; p.full_sim = True  # full run like bench protocol
    ep = ExperimentParams(); ep.runs = 16; ep.A_source = 'sobol'; ep.A_seed = 85972
    rv = generate_A_factors(ep)
    A0b, A1b = p.func_A0(p.temp), p.func_A1(p.temp)
    A_pairs = np.stack([rv[:, 0] * A0b, rv[:, 1] * A1b], axis=1)
    sink = HostPipeline(-1)
    t0 = time.time(); kap = _member_kappas(p, A_pairs, sink); print(f"kappas {time.time()-t0:.1f}s")
    sink.close()
    t0 = time.time()
    ens = EnsembleSolver(p, A_pairs, kappas=kap); ens.prepare()
    print(f"ctor+prepare {time.time()-t0:.1f}s")
    t0 = time.time(); ens.solve_or_resume(32); print(f"first chunk (compile) {time.time()-t0:.1f}s")
    ens.prepare()
    t0 = time.time(); sols = ens.solve_or_resume(512)
    dt = time.time() - t0
    steps = sum(s.computed_steps - 1 for s in sols)
    print(f"steady: {steps} member-steps in {dt:.2f}s = {steps/dt:.0f} member-steps/s")
