"""Where does adaptive N=2048 blow up: step index and delt trajectory."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import numpy as np
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    p = ct.Parameters()
    p.N = 2048
    p.ntmax = 700
    p.no_gui = True
    p.full_sim = True
    p.adaptive_time = True
    p.precision = 'float64'
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4
    p.chunk_size = 50
    s = Solver(p)
    s.prepare()
    try:
        s.solve_or_resume(p.ntmax)
    except FloatingPointError:
        pass
    td = s.solution.timedata
    n = len(td)
    delt = np.asarray(td.delt[:n])
    E = np.asarray(td.E[:n])
    print(f"rows inserted: {n}")
    print(f"delt: start {delt[0]:.3e} end {delt[-1]:.3e} max {delt.max():.3e}")
    print(f"delt trajectory every 100: {[f'{d:.2e}' for d in delt[::100]]}")
    print(f"E finite count: {int(np.isfinite(E).sum())}/{n}")
    print(f"delt_max param: {p.delt_max}")
