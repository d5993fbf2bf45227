"""Measured MFU/roofline accounting for PERFORMANCE.md round 5.

For each flagship route at N in {2048, 4096, 8192}: steady-state
steps/s (warm cache, the f64_step_bench chunk protocol), the
route-resolved issued-operation count per step (from the actual
StepConfig: split levels / rfold levels / pass counts), and the implied
fraction of the v5e MXU peak (197 TFLOP/s bf16, 394 TOPS int8).

Usage: python scripts/probes/roofline.py [f32|f64|both]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

BF16_PEAK = 197e12   # v5e FLOP/s (MXU, bf16 multiply + f32 accumulate)
INT8_PEAK = 394e12   # v5e OPS (int8 multiply + int32 accumulate)
HBM_BW = 819e9       # v5e bytes/s


def tri(n):
    return n * (n + 1) // 2


def split_mac_fraction(levels):
    """MAC fraction of the split tree at depth L vs the plain N^3 matmul:
    sum_l 4^-l (odd branches) + 4^-L (even leaf)."""
    return sum(4.0 ** -l for l in range(1, levels + 1)) + 4.0 ** -levels


def measure(ct, Solver, np, N, precision):
    p = ct.Parameters()
    p.N = N
    p.precision = precision
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.kappa_tilde = 2.98911291966116e-4
    p.ntmax = 1000000
    # chunk sizing: the remote tunnel costs ~100 ms per chunk round
    # trip, so fast (f32) steps need big chunks to amortize it; slow
    # f64 steps amortize at 128
    chunk = 1024 if precision == 'float32' else 128
    timed = chunk
    p.chunk_size = chunk
    s = Solver(p)
    cfg = s.cfg
    s.prepare()
    s.solve_or_resume(chunk + 1)
    t0 = time.perf_counter()
    s.solve_or_resume(timed)
    dt = time.perf_counter() - t0
    rate = timed / dt
    ms = 1000.0 * dt / timed

    N3 = float(N) ** 3
    row = {'N': N, 'precision': precision,
           'transform': cfg.transform_backend,
           'steps_per_s': rate, 'ms_per_step': ms}
    if precision == 'float32':
        lv = cfg.split_levels_resolved
        m = split_mac_fraction(lv)
        p_fwd = 1 if (cfg.fwd_matmul_precision or
                      cfg.matmul_precision) == 'default' else 3
        p_inv = {'highest': 6, 'high': 3, 'default': 1}[
            cfg.matmul_precision]
        if cfg.inv_band:
            # banded inverse: low band keeps p_inv passes, tail runs 1
            bfrac = cfg.inv_band / N
            p_inv = p_inv * bfrac + 1.0 * (1.0 - bfrac)
        macs = 2.0 * N3 * m * (p_fwd + p_inv)
        flops = 2.0 * macs
        row.update(levels=lv, mac_fraction=m, inv_band=cfg.inv_band,
                   fwd_passes=p_fwd,
                   inv_passes=p_inv, issued_bf16_flop_per_step=flops,
                   achieved_tflops=flops * rate / 1e12,
                   mxu_peak_pct=100.0 * flops * rate / BF16_PEAK,
                   compute_floor_ms=1000.0 * flops / BF16_PEAK)
    else:
        lv = cfg.ozaki_rfold_levels
        m = split_mac_fraction(lv) if lv else (0.5 if cfg.ozaki_fold
                                               else 1.0)
        s1f, s2f = cfg.ozaki_fwd_pairs or (5, 7)
        passes = (tri(s1f + 1) + tri(s2f + 1)) + (tri(6) + tri(8))
        macs = m * N3 * passes
        ops = 2.0 * macs
        row.update(rfold_levels=lv, mac_fraction=m,
                   fwd_pairs=[s1f, s2f], inv_pairs=[5, 7],
                   int8_passes=passes, issued_int8_ops_per_step=ops,
                   achieved_tops=ops * rate / 1e12,
                   mxu_peak_pct=100.0 * ops * rate / INT8_PEAK,
                   compute_floor_ms=1000.0 * ops / INT8_PEAK)
    print(json.dumps(row), flush=True)
    return row


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'both'
    import numpy as np

    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver
    rows = []
    if mode in ('f32', 'both'):
        for N in (2048, 4096, 8192):
            rows.append(measure(ct, Solver, np, N, 'float32'))
    if mode in ('f64', 'both'):
        for N in (2048, 4096, 8192):
            rows.append(measure(ct, Solver, np, N, 'float64'))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       '..', '..', 'artifacts', 'r5', 'roofline.json')
    with open(out, 'w') as f:
        json.dump(rows, f, indent=1)
    print('->', os.path.normpath(out))
