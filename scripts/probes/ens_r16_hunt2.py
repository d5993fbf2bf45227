"""R=16 vmapped-f64 NaN hunt: trim on/off, resume boundary on/off, and
the extreme member run alone."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import numpy as np
    import chsimpy_tpu as ct
    from chsimpy_tpu import material
    from chsimpy_tpu.ensemble import EnsembleSolver

    def run(tag, R, pairs_cfg, split=False, member0=0):
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
        ap = np.array([[A0 * (1 + 0.0005 * (member0 + i)),
                        A1 * (1 - 0.0005 * (member0 + i))]
                       for i in range(R)])
        ens = EnsembleSolver(p, ap)
        ens.prepare()
        try:
            if split:
                ens.solve_or_resume(257)
                ens.solve_or_resume(512)
            else:
                ens.solve_or_resume(769)
            Us, = ens._host_leaves(ens._states.U)
            print(f"{tag}: ok finite={np.isfinite(Us).all()}", flush=True)
        except FloatingPointError as e:
            print(f"{tag}: NaN ({e})", flush=True)

    run('R=16 trim  one-shot', 16, None)
    run('R=16 (5,7) one-shot', 16, (5, 7))
    run('R=16 trim  split257+512', 16, None, split=True)
    run('R=1 member15 trim', 1, None, member0=15)
    run('R=8 members 8-15 trim', 8, None, member0=8)
