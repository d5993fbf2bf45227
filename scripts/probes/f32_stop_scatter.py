"""f32 stop-step scatter vs the reference's exact stops, across sizes.

Reference stops: N=512 -> 1674 (BASELINE), N=1024 -> 1837
(tests/golden/n1024_uniform_stop.json), N=2048 -> (golden pending).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    REF = {512: 1674, 1024: 1837}
    for N in (512, 1024):
        p = ct.Parameters()
        p.N = N
        p.no_gui = True
        p.precision = 'float32'
        s = Solver(p)
        s.prepare()
        sol = s.solve_or_resume(p.ntmax)
        ref = REF[N]
        dev = (sol.computed_steps - ref) / ref
        print(f"N={N}: f32 stop {sol.computed_steps} vs ref {ref} "
              f"({dev:+.2%}), reason={sol.stop_reason}", flush=True)
