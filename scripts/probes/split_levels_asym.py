"""Fold-depth sweep at N=4096 f32 under the asymmetric forward default."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import time
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver
    for lv in (3, 4, 5, 6):
        p = ct.Parameters()
        p.N = 4096; p.ntmax = 256; p.no_gui = True; p.full_sim = True
        p.precision = 'float32'; p.chunk_size = 1024; p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.split_levels = lv
        s = Solver(p)
        s.prepare(); s.solve_or_resume(64)
        best = 0.0
        for _ in range(3):
            s.prepare()
            t0 = time.time()
            sol = s.solve_or_resume(256)
            best = max(best, (sol.computed_steps - 1) / (time.time() - t0))
        print(f"lv{lv}: {best:.1f} steps/s", flush=True)
