#!/usr/bin/env python
"""2-D DCT transform bake-off on the live backend.

Times a jitted forward+inverse round trip (the per-step transform work of
the CH stepper: ``idct2(update(dct2(x)))`` without the update) for each
available route:

* ``matmul-high``    — C·U·Cᵀ chains at ``Precision.HIGH`` (3-pass bf16)
* ``matmul-highest`` — same at ``Precision.HIGHEST`` (6-pass bf16)
* ``fft``            — Makhoul N-point rFFT route (``ops/dct.py``)
* ``pallas``         — hand-tiled MXU matmul kernels (f32 only)

Run on the real TPU to decide the default transform per (N, dtype); the
winner feeds PERFORMANCE.md and ``StepConfig.transform_backend='auto'``.

Timing protocol per CLAUDE.md: the remote backend's ``block_until_ready``
does not flush, so every sample ends with a scalar readback; first call
per shape is compile (excluded).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dct as dct_ops


INNER = 50  # chained round trips per dispatch: amortizes the remote-tunnel
            # latency (~30 ms/dispatch here) out of the per-op figure


def _roundtrip_fns(N, dtype):
    """name -> jitted fn(x, C) -> x' running INNER chained forward+inverse
    round trips on-device (one dispatch, like the solver's while_loop)."""
    fns = {}

    def chain(body, *extra):
        # extra operands (e.g. split block trees) ride as jit ARGUMENTS —
        # big closure constants compile pathologically on the TPU service
        def f(x, C, *ex):
            return jax.lax.fori_loop(
                0, INNER, lambda i, y: body(y, C, *ex), x)
        jitted = jax.jit(f)
        if extra:
            return lambda x, C: jitted(x, C, *extra)
        return jitted

    def mk_matmul(prec):
        def body(x, C):
            return dct_ops.idct2(dct_ops.dct2(x, C, precision=prec),
                                 C, precision=prec)
        return chain(body)

    fns['matmul-high'] = mk_matmul(jax.lax.Precision.HIGH)
    fns['matmul-highest'] = mk_matmul(jax.lax.Precision.HIGHEST)

    fns['fft'] = chain(
        lambda x, C: dct_ops.idct2_fft(dct_ops.dct2_fft(x)))

    for lv in (1, 2, 3):
        for pname, prec in (('high', jax.lax.Precision.HIGH),
                            ('highest', jax.lax.Precision.HIGHEST)):
            tree = dct_ops.split_tree(N, lv, dtype)

            def body(x, C, tree, prec=prec):
                return dct_ops.idct2_split(
                    dct_ops.dct2_split(x, tree, precision=prec),
                    tree, precision=prec)
            fns[f'split{lv}-{pname}'] = chain(body, tree)

    # the production default: split with the interleave relayouts dropped
    # (permuted spectral basis — see ops/dct.py); levels 4-5 matter at
    # N>=4096 (level 4 is the measured resolver default there)
    for lv in (1, 2, 3, 4, 5):
        tree_p = dct_ops.split_tree(N, lv, dtype)

        def body_perm(x, C, tree):
            return dct_ops.idct2_split_perm(
                dct_ops.dct2_split_perm(x, tree,
                                        precision=jax.lax.Precision.HIGH),
                tree, precision=jax.lax.Precision.HIGH)
        fns[f'split{lv}perm-high'] = chain(body_perm, tree_p)
    # folded-field variant: the level-1 reversal pair around the
    # elementwise region eliminated by keeping the field level-1 folded
    # between inverse and forward (see ops/dct.py fold1) — the round-3
    # headroom candidate; measures the in-loop cost exactly because the
    # chained roundtrips stay in the folded layout throughout
    for lv in (2, 3, 4, 5):
        tree_f = dct_ops.split_tree(N, lv, dtype)

        def body_fold(x, C, tree):
            prec = jax.lax.Precision.HIGH
            return dct_ops.idct2_split_perm_folded(
                dct_ops.dct2_split_perm_folded(x, tree, precision=prec),
                tree, precision=prec)
        fns[f'split{lv}permfold-high'] = chain(body_fold, tree_f)

    # Hou odd-branch recursion (round 4): the top odd blocks become
    # diag -> half-size DCT-II -> row-scale -> alternating cumsum
    # (ops/dct.py).  hou_min sets the smallest odd block Hou'd: 2048
    # engages one block at N=4096 (the 2/3-of-the-matmul-FLOPs one),
    # 1024 also the next level (and the top block at N=2048)
    for lv in (3, 4, 5):
        for hmin, tag in ((2048, ''), (1024, '1k')):
            htree = dct_ops.hou_tree(N, lv, dtype, hou_min=hmin)

            def body_hou(x, C, tree):
                prec = jax.lax.Precision.HIGH
                return dct_ops.idct2_split_perm(
                    dct_ops.dct2_split_perm(x, tree, precision=prec),
                    tree, precision=prec)
            fns[f'hou{lv}perm{tag}-high'] = chain(body_hou, htree)

            def body_houf(x, C, tree):
                prec = jax.lax.Precision.HIGH
                return dct_ops.idct2_split_perm_folded(
                    dct_ops.dct2_split_perm_folded(x, tree, precision=prec),
                    tree, precision=prec)
            fns[f'hou{lv}permfold{tag}-high'] = chain(body_houf, htree)

    tree2 = dct_ops.split_tree(N, 2, dtype)

    # the pre-round-2.5 form of the permuted route: second 1-D pass via
    # full-field transpose + row application (A/B control for the
    # transpose-free right application above)
    def body_perm_tr(x, C, tree):
        prec = jax.lax.Precision.HIGH

        def f2d(u):
            X = dct_ops._apply_split_perm(tree, u, prec)
            return dct_ops._apply_split_perm(tree, X.T, prec).T

        def i2d(X):
            u = dct_ops._apply_split_t_perm(tree, X, prec)
            return dct_ops._apply_split_t_perm(tree, u.T, prec).T
        return i2d(f2d(x))
    fns['split2permT-high'] = chain(body_perm_tr, tree2)

    if jnp.dtype(dtype) == jnp.float32:
        from ..ops import pallas_kernels as pk
        fns['pallas'] = chain(
            lambda x, C: pk.idct2_pallas(pk.dct2_pallas(x, C), C))

    if jnp.dtype(dtype) == jnp.float64:
        # exact int8-slice MXU route (the TPU f64 production default)
        from ..ops import ozaki
        Cs, CsT, sc = ozaki.dct_slices(N)

        def body_oz(x, C, Cs, CsT):
            return ozaki.idct2_ozaki(
                ozaki.dct2_ozaki(x, Cs, CsT, sc), Cs, CsT, sc)
        fns['ozaki-int8'] = chain(body_oz, Cs, CsT)

        def body_oz_ps(x, C, Cs, CsT):
            return ozaki.idct2_ozaki(
                ozaki.dct2_ozaki(x, Cs, CsT, sc, pallas_slice=True),
                Cs, CsT, sc, pallas_slice=True)
        fns['ozaki-int8-pslice'] = chain(body_oz_ps, Cs, CsT)

        # level-1 folded blocks: half the int8 MACs of ozaki-int8
        fsl = ozaki.dct_fold_slices(N)
        fstacks = (fsl['CeS'], fsl['CoS'], fsl['CeTS'], fsl['CoTS'])
        fsc = fsl['scale']

        def body_oz_fold(x, C, CeS, CoS, CeTS, CoTS):
            fs = {'CeS': CeS, 'CoS': CoS, 'CeTS': CeTS, 'CoTS': CoTS,
                  'scale': fsc}
            return ozaki.idct2_ozaki_fold(
                ozaki.dct2_ozaki_fold(x, fs), fs)
        fns['ozaki-int8-fold'] = chain(body_oz_fold, *fstacks)

        # recursive folded permuted route (round 4): MAC fractions 1/2,
        # 3/8, 11/32 at L=1,2,3; no interleaves or strided gathers.
        # The roundtrip is permuted-basis internally; chaining fwd+inv
        # keeps the natural field fixed point like the other routes.
        for L in (1, 2, 3):
            rfl, rsc = ozaki.dct_rfold_slices(N, L)
            flat = [a for pair in rfl for a in pair]

            def body_rf(x, C, *flat, L=L, rsc=rsc):
                rf = [(flat[2 * i], flat[2 * i + 1])
                      for i in range(len(flat) // 2)]
                return ozaki.idct2_ozaki_rfold(
                    ozaki.dct2_ozaki_rfold(x, rf, rsc, L), rf, rsc, L)
            fns[f'ozaki-rfold{L}'] = chain(body_rf, *flat)

            def body_rfp(x, C, *flat, L=L, rsc=rsc):
                rf = [(flat[2 * i], flat[2 * i + 1])
                      for i in range(len(flat) // 2)]
                return ozaki.idct2_ozaki_rfold(
                    ozaki.dct2_ozaki_rfold(x, rf, rsc, L,
                                           pallas_slice=True),
                    rf, rsc, L, pallas_slice=True)
            fns[f'ozaki-rfold{L}-pslice'] = chain(body_rfp, *flat)

        def body_oz_fg(x, C, Cs, CsT):
            # measured negative kept reproducible (PERFORMANCE.md): the
            # multi-contracting-dim group dots lose to the pairwise form
            return ozaki.idct2_ozaki(
                ozaki.dct2_ozaki(x, Cs, CsT, sc, fused_groups=True),
                Cs, CsT, sc, fused_groups=True)
        fns['ozaki-int8-fused'] = chain(body_oz_fg, Cs, CsT)
    return fns


def time_route(fn, x, C, reps):
    """Median ms per round trip; forces a real readback each sample
    (block_until_ready does not flush the remote backend)."""
    r = fn(x, C)
    float(r[0, 0])  # compile + first execute
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(x, C)
        float(r[0, 0])
        samples.append((time.perf_counter() - t0) * 1e3 / INNER)
    return float(np.median(samples)), float(np.min(samples))


def accuracy_route(fn, x, C):
    """Accumulated error vs the input after INNER chained round trips
    (an exact transform pair returns x unchanged)."""
    r = np.asarray(fn(x, C))
    return float(np.max(np.abs(r - np.asarray(x))))


def main(argv=None):
    import chsimpy_tpu as _ct
    _ct.honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--sizes', default='2048,4096,8192')
    ap.add_argument('--dtypes', default='float32,float64')
    ap.add_argument('--reps', type=int, default=10)
    ap.add_argument('--routes', default=None,
                    help='comma-separated route-name substrings to run '
                         '(default: all)')
    ap.add_argument('--out', default=None, help='write JSON results here')
    args = ap.parse_args(argv)
    route_filter = args.routes.split(',') if args.routes else None

    backend = jax.default_backend()
    print(f"# backend: {backend}, devices: {jax.devices()}")
    results = []
    for N in [int(s) for s in args.sizes.split(',')]:
        for dtype in args.dtypes.split(','):
            x = jnp.asarray(
                np.random.default_rng(0).random((N, N)), dtype)
            C = dct_ops.dct_matrix(N, dtype)
            for name, fn in _roundtrip_fns(N, dtype).items():
                if route_filter and not any(s in name
                                            for s in route_filter):
                    continue
                try:
                    med, best = time_route(fn, x, C, args.reps)
                    err = accuracy_route(fn, x, C)
                except Exception as e:
                    print(f"N={N} {dtype} {name}: FAILED {type(e).__name__}:"
                          f" {str(e)[:120]}")
                    results.append({'N': N, 'dtype': dtype, 'route': name,
                                    'error': str(e)[:200]})
                    continue
                print(f"N={N} {dtype} {name}: {med:.2f} ms median "
                      f"({best:.2f} best), rt-err {err:.2e}")
                results.append({'N': N, 'dtype': dtype, 'route': name,
                                'ms_median': round(med, 3),
                                'ms_best': round(best, 3),
                                'roundtrip_err': err})
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({'backend': backend, 'results': results}, f, indent=1)
        print(f"# wrote {args.out}")


if __name__ == '__main__':
    main()
