"""R=16 f64 ensemble with the unfolded-route gate: full-length run,
member trajectories vs single runs, and the rate capture."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
if __name__ == '__main__':
    import json
    import time

    import numpy as np

    import chsimpy_tpu as ct
    from chsimpy_tpu import material
    from chsimpy_tpu.ensemble import EnsembleSolver

    def make(R, member0=0, chunk=256):
        p = ct.Parameters()
        p.N = 512
        p.precision = 'float64'
        p.no_gui = True
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.chunk_size = chunk
        A0 = material.A0(p.temp)
        A1 = material.A1(p.temp)
        ap = np.array([[A0 * (1 + 0.0005 * (member0 + i)),
                        A1 * (1 - 0.0005 * (member0 + i))]
                       for i in range(R)])
        ens = EnsembleSolver(p, ap)
        assert not ens.cfg.ozaki_fold and not ens.cfg.ozaki_rfold_levels \
            if R > 4 else True
        ens.prepare()
        return ens

    # correctness: 20-step member equality vs R=1 runs
    e16 = make(16, chunk=20)
    e16.solve_or_resume(20)
    U16, = e16._host_leaves(e16._states.U)
    worst = 0.0
    for r in (0, 7, 15):
        e1 = make(1, member0=r, chunk=20)
        e1.solve_or_resume(20)
        U1, = e1._host_leaves(e1._states.U)
        worst = max(worst, float(np.max(np.abs(U16[r] - U1[0]))))
    print(f"R=16 vs single, 20 steps: max|dU| {worst:.3e}", flush=True)

    # survival + rate: the ensemble_f64_rate protocol
    ens = make(16)
    ens.solve_or_resume(257)
    t0 = time.perf_counter()
    ens.solve_or_resume(512)
    dt = time.perf_counter() - t0
    Us, = ens._host_leaves(ens._states.U)
    rate = 512.0 * 16 / dt
    print(json.dumps({'R': 16, 'finite': bool(np.isfinite(Us).all()),
                      'member_steps_per_s': round(rate, 1),
                      'vs_ref_core': round(rate / 34.47, 1)}), flush=True)
