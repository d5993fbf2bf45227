#!/usr/bin/env python
"""Component-level profile of the Ozaki int8 f64 transform on the chip.

The full ``--transform ozaki`` round trip costs ~63 ms at N=4096 while its
72 int8 MXU dots account for only ~11 ms at the measured 878 Tops/s — the
rest lives in the pointwise glue (double-single slicing, int32 carry
renormalization, f64 Horner recombination).  This tool times cumulative
pipeline prefixes so the per-stage cost falls out by differencing:

  P1 slice      : slice_field + direct 8-slice f64 recombination
  P2 +stage1    : slice -> 28 int8 dots -> group Horner   (value = C @ U)
  P3 +renorm    : slice -> 28 dots -> carry renorm -> 10-slice recombination
  P4 full dct2  : the production forward transform (adds the 44 stage-2
                  dots + final Horner + DC split)

All pipelines map an (N, N) f64 field to an equal-norm (N, N) f64 field
(the 1-D DCT pass is norm-preserving), so each can chain through a
``fori_loop`` like the solver's hot loop; every sample ends with a scalar
readback (the remote backend's ``block_until_ready`` does not flush).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ozaki


def _recombine(slices, scale, dtype):
    """sum_k slices[k] * 2^{-7(k+1)}, times scale — inverse of the slice
    convention; a Horner chain like the stage-2 recombination."""
    acc = slices[-1].astype(dtype)
    for k in range(slices.shape[0] - 2, -1, -1):
        acc = acc * dtype(2.0 ** -7) + slices[k].astype(dtype)
    return acc * dtype(2.0 ** -7) * scale


def build_pipelines(N):
    """Pipelines take the int8 matrix slice stacks as ARGUMENTS — captured
    as closure constants they are ~134 MB each of HLO literal, which blows
    the remote compile service's request-size limit (HTTP 413) and
    compiles pathologically (CLAUDE.md rule 2)."""
    dt = jnp.dtype(jnp.float64).type
    q = ozaki.RENORM_SHIFT // 7
    # mirror the PRODUCTION emission counts (ozaki._transform2d): the
    # stage-cost differencing is only meaningful if P1-P3 run the same
    # slice/renorm chains P4's transform does
    n_field = min(ozaki.N_SLICES, ozaki.STAGE1_PAIR + 1)
    n_renorm = min(ozaki.N_SLICES + q, ozaki.STAGE2_PAIR + 1)

    def p1_slice(x, Cs, CsT, sc):
        Us, su = ozaki.slice_field(x, n_field)
        return _recombine(Us, su, dt)

    def p2_stage1(x, Cs, CsT, sc):
        Us, su = ozaki.slice_field(x, n_field)
        g1 = ozaki._pair_groups(Cs, Us, ozaki._dot_left,
                                max_pair=ozaki.STAGE1_PAIR)
        z = ozaki._horner_f64(g1)
        return jax.lax.optimization_barrier(z * (su * sc))

    def p3_renorm(x, Cs, CsT, sc):
        Us, su = ozaki.slice_field(x, n_field)
        g1 = ozaki._pair_groups(Cs, Us, ozaki._dot_left,
                                max_pair=ozaki.STAGE1_PAIR)
        t = ozaki._renorm_to_slices(g1, n_slices=n_renorm)
        r = _recombine(t, su * sc * dt(2.0 ** ozaki.RENORM_SHIFT), dt)
        return jax.lax.optimization_barrier(r)

    def p4_full(x, Cs, CsT, sc):
        return ozaki.dct2_ozaki(x, Cs, CsT, sc)

    # (the round-2.9 fused-kernel F rows were measured SLOWER than their
    # production counterparts on the chip — F3 +4.3 ms, F4 +6.3 ms at
    # N=4096, artifacts/r3/capture_r3_fused.log — and the kernels were
    # deleted; this profile keeps only the production pipeline)
    return {'P1 slice+recombine': p1_slice,
            'P2 +stage1 dots': p2_stage1,
            'P3 +renorm': p3_renorm,
            'P4 full dct2': p4_full}


def time_pipeline(fn, x, consts, inner, reps):
    Cs, CsT, sc = consts
    f = jax.jit(lambda u, Cs, CsT: jax.lax.fori_loop(
        0, inner, lambda i, y: fn(y, Cs, CsT, sc), u))
    f = functools.partial(f, Cs=Cs, CsT=CsT)
    r = f(x)
    float(r[0, 0])  # compile + first run
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(x)
        float(r[0, 0])
        samples.append((time.perf_counter() - t0) * 1e3 / inner)
    return float(np.median(samples)), float(np.min(samples))


def main(argv=None):
    import chsimpy_tpu as _ct
    _ct.honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('-N', type=int, default=4096)
    ap.add_argument('--inner', type=int, default=10)
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--out', default=None)
    args = ap.parse_args(argv)

    print(f"# backend: {jax.default_backend()}")
    x = jnp.asarray(0.875 + 0.01 * (np.random.default_rng(0)
                                    .random((args.N, args.N)) - 0.5),
                    jnp.float64)
    consts = ozaki.dct_slices(args.N)
    # rows difference against the previous row (cumulative prefixes)
    rows = []
    prev = 0.0
    for name, fn in build_pipelines(args.N).items():
        med, best = time_pipeline(fn, x, consts, args.inner, args.reps)
        delta = med - prev
        label = f"delta {delta:+.2f} ms"
        prev = med
        print(f"{name}: {med:.2f} ms median ({best:.2f} best), {label}")
        rows.append({'pipeline': name, 'ms_median': round(med, 3),
                     'ms_best': round(best, 3),
                     'ms_delta': round(delta, 3)})
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({'N': args.N, 'results': rows}, f, indent=1)
        print(f"# wrote {args.out}")


if __name__ == '__main__':
    main()
