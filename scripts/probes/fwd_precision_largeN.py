"""fwd-precision accuracy at N=2048 vs f64-ozaki truth (200 steps)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import numpy as np
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    def run(precision, fwd=None):
        p = ct.Parameters()
        p.N = 2048
        p.ntmax = 200
        p.no_gui = True
        p.full_sim = True
        p.precision = precision
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.fwd_matmul_precision = fwd
        s = Solver(p)
        s.prepare()
        sol = s.solve_or_resume(p.ntmax)
        n = sol.computed_steps
        return (np.asarray(sol.E[:n]), np.asarray(sol.E2[:n]))

    E64, E264 = run('float64')
    for fwd in (None, 'default'):
        E, E2 = run('float32', fwd)
        erel = float(np.max(np.abs(E - E64) / np.abs(E64)))
        e2rel = float(np.max(np.abs(E2 - E264) / np.abs(E264)))
        print(f"fwd={fwd or 'same':8s} maxrel E={erel:.3e}  E2={e2rel:.3e}")
