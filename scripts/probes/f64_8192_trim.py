"""N=8192 f64 steady rate with the forward trim (was 2.48 steps/s)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import time
    import jax
    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver
    assert jax.devices()[0].platform != 'cpu'
    p = ct.Parameters()
    p.N = 8192
    p.precision = 'float64'
    p.no_gui = True
    p.full_sim = True
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4
    p.chunk_size = 32
    s = Solver(p)
    s.prepare()
    s.solve_or_resume(8)
    t0 = time.perf_counter()
    s.solve_or_resume(32)
    dt = time.perf_counter() - t0
    print(f"N=8192 f64 trim: {32/dt:.2f} steps/s ({dt/32*1e3:.0f} ms/step)")
