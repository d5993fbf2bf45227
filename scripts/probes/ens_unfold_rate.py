"""Rate matrix: fold vs unfolded ozaki routes at R=2/4/8/16 (N=512 f64),
separating route cost from batch-width effects."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import dataclasses
    import time

    import numpy as np

    import chsimpy_tpu as ct
    from chsimpy_tpu import material
    from chsimpy_tpu.ensemble import EnsembleSolver

    def rate(R, force_unfold=None):
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
        ap = np.array([[A0 * (1 + 0.0005 * i), A1 * (1 - 0.0005 * i)]
                       for i in range(R)])
        ens = EnsembleSolver(p, ap)
        if force_unfold:
            from chsimpy_tpu.core.stepper import make_ensemble_runner
            ens.cfg = dataclasses.replace(ens.cfg, ozaki_fold=False,
                                          ozaki_rfold_levels=0)
            ens._run = make_ensemble_runner(ens.cfg, mesh=None)
        ens.prepare()
        ens.solve_or_resume(257)
        t0 = time.perf_counter()
        ens.solve_or_resume(512)
        dt = time.perf_counter() - t0
        route = ('unfold' if not ens.cfg.ozaki_fold else 'fold')
        print(f"R={R:2d} {route}: {512.0 * R / dt:7.1f} member-steps/s",
              flush=True)

    rate(2)
    rate(4)
    rate(5)   # > 4: the gate forces the unfolded route
    rate(8)
    rate(16)
