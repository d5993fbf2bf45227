#!/usr/bin/env python
"""Standalone reproducer: vmapped int8 slice-matmul pipeline miscompiles
on TPU at batch >= 8 when fused with a gather-broadcast consumer.

No project imports — jax + numpy only.  See B8_ISSUE.md next to this
file for the full issue text.

The computation is an "Ozaki-style" exact int8 decomposition of an
orthonormal DCT-II applied two-sided to an f64 field (every step is
exact integer arithmetic between f64 renormalizations; the max|error| of
the vmapped result vs the per-sample result should be ~1e-16 relative).
Each sample of the batch is INDEPENDENT, so for any batch size the
vmapped program must equal the per-sample loop bit-for-bit or close to
it.  Observed on TPU (v5e, jax 0.9.x, August 2026):

* batch <= 4: vmapped == per-sample (exact);
* batch >= 8 AND the transform output y is consumed by an expression
  that broadcasts a GATHERED scalar y[0, 0] back over the field — even
  with ZERO weight, e.g. (f(y) + 0.0 * y[0, 0]).sum() — the TRANSFORM
  ITSELF returns DC-scale-wrong values (max abs error ~1e-3..1e+0
  instead of ~1e-13);
* the same consumer written as a scalar-after-reduce —
  f(y).sum() + 0.0 * y[0, 0] — is clean;
* CPU backend: clean at every batch size.

Run:  python b8_repro_standalone.py [batch ...]
Prints the max abs error of the vmapped forward transform vs the
per-sample loop for each batch size, for both consumer forms, and exits
nonzero if the zero-weight gather-broadcast form corrupts the transform.
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update('jax_enable_x64', True)

N = 512           # field size (N x N); miscompile observed at >= 512
S = 6             # int8 slices: 7 bits/slice, 42 bits — plenty for repro
MAXP = 5          # slice-pair cutoff i+j <= MAXP
SHIFT = 14        # renorm headroom (2 slice slots)


# --- exact int8 slicing ----------------------------------------------------

def slice_host(M, scale):
    """f64 matrix -> list of int8 arrays, M ~= scale * sum_k s_k 128^-(k+1)."""
    v = np.asarray(M, np.float64) / scale
    out = []
    for _ in range(S):
        v = v * 128.0
        s = np.rint(v)
        v = v - s
        out.append(s.astype(np.int8))
    return out


def slice_field(x):
    """Device slicing of an f64 field (values in (0, 2)): int8 [S, n, m]."""
    scale = jnp.float64(4.0)           # static power of two, exact
    v = (x / scale).astype(jnp.float64)
    sl = []
    for _ in range(S):
        v = v * 128.0
        s = jnp.round(v)
        v = v - s
        sl.append(s.astype(jnp.int8))
    return jnp.stack(sl), scale


# --- int8 two-sided transform: Y = C @ X @ C^T -----------------------------

def dct_matrix(n):
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    C = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * np.sqrt(2.0 / n)
    C[0] *= np.sqrt(0.5)
    return C


def pair_groups(a, b, contract):
    """All slice products a_i . b_j with i+j <= MAXP, summed by k=i+j."""
    groups = [None] * (MAXP + 1)
    for i in range(a.shape[0]):
        for j in range(min(b.shape[0], MAXP + 1 - i)):
            p = contract(a[i], b[j])
            k = i + j
            groups[k] = p if groups[k] is None else groups[k] + p
    return groups


def dot_left(c, u):
    return jax.lax.dot_general(c, u, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def dot_right(u, c):
    return jax.lax.dot_general(u, c, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def renorm(groups):
    """Carry-renormalize int32 groups into int8 slices (exact)."""
    q = SHIFT // 7
    low = len(groups) + q
    acc = jnp.zeros_like(groups[0])
    slots = {}
    for j in range(low, -1, -1):
        k = j - q - 1
        if 0 <= k < len(groups):
            acc = acc + groups[k]
        r = ((acc + 64) & 127) - 64
        slots[j] = r
        acc = (acc - r) >> 7
    zero = jnp.zeros_like(groups[0].astype(jnp.int8))
    return jnp.stack([slots[j].astype(jnp.int8) if j in slots else zero
                      for j in range(S)])


def horner(groups):
    acc = groups[-1].astype(jnp.float64)
    for k in range(len(groups) - 2, -1, -1):
        acc = acc * (2.0 ** -7) + groups[k].astype(jnp.float64)
    return acc * (2.0 ** -14)


def make_consts():
    C = dct_matrix(N)
    cmax = float(np.max(np.abs(C)))
    csc = 2.0 ** (int(np.ceil(np.log2(cmax))) + 2)
    Cs = jnp.stack(slice_host(C, csc))
    CTs = jnp.stack(slice_host(C.T, csc))
    return Cs, CTs, csc


def fwd(x, Cs, CTs, csc):
    """C @ x @ C^T in exact int8/int32 with one renormalization."""
    xs, xscale = slice_field(x)
    g1 = pair_groups(Cs, xs, dot_left)           # C @ x (int32 groups)
    t = renorm(g1)                               # -> int8 slices
    g2 = pair_groups(t, CTs, dot_right)          # (.) @ C^T
    z = horner(g2)
    return z * (xscale * csc * csc * (2.0 ** SHIFT))


def main():
    batches = [int(a) for a in sys.argv[1:]] or [2, 4, 8, 16]
    Cs, CTs, csc = make_consts()
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}  N={N} slices={S}")
    bad = False
    for B in batches:
        x = jnp.asarray(
            0.875 * (1 + 0.01 * (rng.random((B, N, N)) - 0.5)))
        # ground truth: per-sample jit (no vmap)
        f1 = jax.jit(lambda u: fwd(u, Cs, CTs, csc))
        y_ref = np.stack([np.asarray(f1(x[i])) for i in range(B)])

        def run(consumer, tag):
            def g(u):
                y = fwd(u, Cs, CTs, csc)
                return y, consumer(y)
            yv, _ = jax.jit(jax.vmap(g))(x)
            err = float(np.max(np.abs(np.asarray(yv) - y_ref)))
            print(f"  B={B:3d} {tag:34s} max|err| {err:.3e}"
                  f"  {'OK' if err < 1e-9 else 'CORRUPT'}", flush=True)
            return err

        run(lambda y: y.sum() + 0.0 * y[0, 0],
            'scalar-after-reduce (control)')
        err = run(lambda y: (y + 0.0 * y[0, 0]).sum(),
                  'zero-weight gather broadcast')
        if err >= 1e-9:
            bad = True
    print('RESULT:', 'CORRUPTION REPRODUCED' if bad else 'clean')
    return 1 if bad else 0


if __name__ == '__main__':
    sys.exit(main())
