"""Early-step U divergence: R=16 batch members vs the same members in
R=1/R=8 batches (20 steps, f64)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import numpy as np
    import chsimpy_tpu as ct
    from chsimpy_tpu import material
    from chsimpy_tpu.ensemble import EnsembleSolver

    def states_after(R, nsteps, member0=0, R_total=None):
        p = ct.Parameters()
        p.N = 512
        p.precision = 'float64'
        p.no_gui = True
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.chunk_size = nsteps
        A0 = material.A0(p.temp)
        A1 = material.A1(p.temp)
        ap = np.array([[A0 * (1 + 0.0005 * (member0 + i)),
                        A1 * (1 - 0.0005 * (member0 + i))]
                       for i in range(R)])
        ens = EnsembleSolver(p, ap)
        ens.prepare()
        ens.solve_or_resume(nsteps)
        Us, = ens._host_leaves(ens._states.U)
        return Us

    U16 = states_after(16, 20)
    U8a = states_after(8, 20, member0=0)
    U8b = states_after(8, 20, member0=8)
    ref = np.concatenate([U8a, U8b], axis=0)
    for r in range(16):
        d = float(np.max(np.abs(U16[r] - ref[r])))
        if d > 1e-13 or r in (0, 15):
            print(f"member {r}: max|dU| after 20 steps = {d:.3e}",
                  flush=True)
