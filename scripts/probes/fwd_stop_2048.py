"""Stop-step behavior at N=2048 f32 under the asymmetric forward default
vs symmetric HIGH (the adoption boundary is N >= 2048)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import numpy as np
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    def run(fwd):
        p = ct.Parameters()
        p.N = 2048
        p.no_gui = True
        p.precision = 'float32'
        p.fwd_matmul_precision = fwd
        p.kappa_tilde = 2.98911291966116e-4
        s = Solver(p)
        s.prepare()
        sol = s.solve_or_resume(p.ntmax)
        print(f"fwd={fwd or 'auto(default)'}: stop={sol.computed_steps} "
              f"reason={sol.stop_reason} tau0={sol.tau0}", flush=True)

    run('high')   # symmetric
    run(None)     # the auto default (1-pass fwd at N>=2048)
