import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import time
    import jax; jax.config.update('jax_platforms', 'cpu')
    from chsimpy_tpu import Parameters
    from chsimpy_tpu.experiment import (HostPipeline, _member_kappa_task,
                                        generate_A_factors, ExperimentParams)
    p = Parameters(); p.N = 512; p.cinit = 0.89
    ep = ExperimentParams(); ep.runs = 16; ep.A_source = 'sobol'; ep.A_seed = 85972
    rv = generate_A_factors(ep)
    A0b, A1b = p.func_A0(p.temp), p.func_A1(p.temp)
    pairs = [(float(rv[i, 0] * A0b), float(rv[i, 1] * A1b)) for i in range(16)]
    t0 = time.time(); sink = HostPipeline(-1); print(f"pool ctor {time.time()-t0:.2f}s")
    t0 = time.time(); vals = sink.map(_member_kappa_task, [(p, a0, a1) for a0, a1 in pairs])
    print(f"pooled kappa x16 (cold workers) {time.time()-t0:.2f}s")
    t0 = time.time(); sink.map(_member_kappa_task, [(p, a0, a1) for a0, a1 in pairs])
    print(f"pooled kappa x16 (warm) {time.time()-t0:.2f}s")
    t0 = time.time()
    from chsimpy_tpu.ensemble import derive_member_constants
    [derive_member_constants(p, a0, a1) for a0, a1 in pairs[:4]]
    print(f"serial kappa x4 {time.time()-t0:.2f}s")
    sink.close()
