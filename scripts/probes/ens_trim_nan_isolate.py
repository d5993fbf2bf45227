"""Isolate the vmapped-f64 NaN: trim default vs untrimmed, and vmapped
vs single, on the ensemble_f64_rate config."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import numpy as np
    import chsimpy_tpu as ct
    from chsimpy_tpu import material
    from chsimpy_tpu.ensemble import EnsembleSolver

    def run(R, pairs_cfg, nsteps=769):
        p = ct.Parameters()
        p.N = 512
        p.precision = 'float64'
        p.no_gui = True
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.chunk_size = 256
        p.ozaki_fwd_pairs = pairs_cfg
        A0 = material.A0(p.temp)
        A1 = material.A1(p.temp)
        ap = np.array([[A0 * (1 + 0.0005 * i), A1 * (1 - 0.0005 * i)]
                       for i in range(R)])
        ens = EnsembleSolver(p, ap)
        ens.prepare()
        try:
            ens.solve_or_resume(nsteps)
            Us, = ens._host_leaves(ens._states.U)
            print(f"R={R} pairs={pairs_cfg or '(3,5)def'}: ok "
                  f"finite={np.isfinite(Us).all()} "
                  f"Umin={Us.min():.4f} Umax={Us.max():.4f}", flush=True)
        except FloatingPointError as e:
            print(f"R={R} pairs={pairs_cfg or '(3,5)def'}: NaN ({e})",
                  flush=True)

    run(1, None)
    run(1, (5, 7))
    run(4, None)
    run(4, (5, 7))
