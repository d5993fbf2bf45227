"""Adaptive time stepping under the asymmetric forward default at
N=2048 f32 (the adaptive rebuild + 1-pass forward composition)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import numpy as np
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    def run(fwd):
        p = ct.Parameters()
        p.N = 2048
        p.ntmax = 700
        p.no_gui = True
        p.full_sim = True
        p.adaptive_time = True
        p.precision = fwd if fwd in ('float32', 'float64') else 'float32'
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        s = Solver(p)
        s.prepare()
        sol = s.solve_or_resume(p.ntmax)
        n = sol.computed_steps
        return (np.asarray(sol.E[:n]), np.asarray(sol.delt[:n]))

    res = {}
    for fwd in ('float64', 'float32'):
        try:
            res[fwd] = run(fwd)
            print(f"fwd={fwd}: ok, {len(res[fwd][0])} steps", flush=True)
        except FloatingPointError as e:
            print(f"fwd={fwd}: NaN ({e})", flush=True)
    if 'high' in res and None in res:
        Eh, dh = res['high']; Ed, dd = res[None]
        n = min(len(Eh), len(Ed))
        print(f"E rel {np.max(np.abs(Ed[:n]-Eh[:n])/np.abs(Eh[:n])):.2e} "
              f"delt rel {np.max(np.abs(dd[:n]-dh[:n])/dh[:n]):.2e}")
