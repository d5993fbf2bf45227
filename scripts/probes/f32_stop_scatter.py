"""f32 stop-step scatter vs the reference's exact stops, across sizes.

Reference stops: N=512 -> 1674 (BASELINE), N=1024 -> 1837
(tests/golden/n1024_uniform_stop.json), N=2048 -> 2040
(tests/golden/n2048_uniform_stop.json).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    REF = {512: 1674, 1024: 1837, 2048: 2040}
    sizes = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048]
    for N in sizes:
        p = ct.Parameters()
        p.N = N
        p.no_gui = True
        p.precision = 'float32'
        p.ntmax = 6000
        s = Solver(p)
        s.prepare()
        sol = s.solve_or_resume(p.ntmax)
        ref = REF[N]
        dev = (sol.computed_steps - ref) / ref
        print(f"N={N}: f32 stop {sol.computed_steps} vs ref {ref} "
              f"({dev:+.2%}), reason={sol.stop_reason}", flush=True)
