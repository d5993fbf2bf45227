import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import time, cProfile, pstats, io
    import numpy as np
    from chsimpy_tpu import Parameters
    from chsimpy_tpu.ensemble import EnsembleSolver
    from chsimpy_tpu.experiment import generate_A_factors, ExperimentParams
    p = Parameters(); p.N = 512; p.precision = 'float32'; p.cinit = 0.89; p.threshold = 0.89
    p.no_gui = True; p.full_sim = True; p.kappa_tilde = 2.98911291966116e-4
    ep = ExperimentParams(); ep.runs = 16; ep.A_source = 'sobol'; ep.A_seed = 85972
    rv = generate_A_factors(ep)
    A0b, A1b = p.func_A0(p.temp), p.func_A1(p.temp)
    A_pairs = np.stack([rv[:, 0] * A0b, rv[:, 1] * A1b], axis=1)
    pr = cProfile.Profile(); pr.enable()
    ens = EnsembleSolver(p, A_pairs)
    pr.disable()
    s = io.StringIO(); pstats.Stats(pr, stream=s).sort_stats('cumulative').print_stats(12)
    print('\n'.join(s.getvalue().splitlines()[4:22]))
