#!/usr/bin/env python
"""Standalone reproducer: vmapped int8 slice-matmul transform corrupted
by a fused zero-weight gather-broadcast consumer at batch >= 8 on TPU.

jax + numpy only — no project imports.  See B8_ISSUE.md for the issue
text.  The computation is an exact "Ozaki-style" int8 decomposition of
an orthonormal DCT-II in level-1 FOLDED form (even/odd cosine-symmetry
blocks), applied two-sided to an f64 field; a partial inverse (the same
int8 machinery) consumes the forward's output in the same jitted
program.  Every sample of the batch is independent, so for any batch
size the vmapped forward must match the per-sample forward to
reduction-order ULPs (~1e-13 here).

Four consumer forms are checked; the forward's own output is compared
against the per-sample loop:

  A  inv(y).sum() + y[0,0]/N     (scalar AFTER the reduce)    -> clean
  B  (inv(y) + y[0,0]/N).sum()   (gathered scalar broadcast)  -> CORRUPT
  C  (inv(y) + 0.0*y[0,0]).sum() (broadcast at ZERO weight)   -> CORRUPT
  D  (inv(y) + y.mean()).sum()   (broadcast of a REDUCE)      -> clean

Observed on TPU v5e (jax/jaxlib 0.9.0, x64 enabled): B and C corrupt
the FORWARD output at DC scale (~1e-2) for batch >= 8 while A and D
stay at ~1e-13/1e-14; batch <= 4 is clean everywhere; the CPU backend
is clean everywhere.  The gathered-scalar broadcast (even at zero
weight) changes the compiled value of an arithmetically unrelated
subgraph.

Run:  python b8_repro_standalone.py [batch ...]     (default: 4 8)
Exit 0 = clean, 1 = corruption reproduced.
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update('jax_enable_x64', True)

N = 512
N_SLICES = 8      # 7 payload bits per slice
S1 = 5            # stage-1 slice-pair cutoff (i + j <= S1)
S2 = 7            # stage-2 cutoff
SHIFT = 14        # renorm headroom (2 slice slots)


# --- host-side constants ---------------------------------------------------

def dct_matrix_np(n):
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    C = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * np.sqrt(2.0 / n)
    C[0] *= np.sqrt(0.5)
    return C


def slice_matrix_host(M, scale=None):
    """Exact fixed-point int8 slicing: M = scale * sum_k s_k 128^-(k+1)."""
    if scale is None:
        amax = float(np.max(np.abs(M)))
        e = int(np.ceil(np.log2(amax))) + 2 if amax > 0 else 0
        scale = float(2.0 ** e)
    u = np.asarray(M, np.float64) / scale
    out = []
    for _ in range(N_SLICES):
        u = u * 128.0
        s = np.round(u)
        u = u - s
        out.append(s.astype(np.int8))
    return out, scale


def fold_slices(n):
    """int8 slice stacks of the folded DCT blocks Ce, Co (+ transposes),
    one shared scale: C[k, n-1-i] = (-1)^k C[k, i] splits C@x into two
    half-size contractions."""
    C = dct_matrix_np(n)
    h = n // 2
    Ce = np.ascontiguousarray(C[0::2, :h])
    Co = np.ascontiguousarray(C[1::2, :h])
    amax = max(float(np.max(np.abs(Ce))), float(np.max(np.abs(Co))))
    sc = float(2.0 ** (int(np.ceil(np.log2(amax))) + 2))
    CeS, _ = slice_matrix_host(Ce, sc)
    CoS, _ = slice_matrix_host(Co, sc)
    return {'CeS': jnp.asarray(np.stack(CeS)),
            'CoS': jnp.asarray(np.stack(CoS)),
            'CeTS': jnp.asarray(np.stack([s.T.copy() for s in CeS])),
            'CoTS': jnp.asarray(np.stack([s.T.copy() for s in CoS])),
            'scale': sc}


# --- device int8 machinery -------------------------------------------------

def _chain_f32(v, n):
    out = []
    for _ in range(n):
        v = v * jnp.float32(128.0)
        s = jnp.round(v)
        v = v - s
        out.append(s)
    return out


def slice_field(x, n_slices):
    """f64 field -> (int8 [S, ...] stack, f64 scale): double-single hi/lo
    split, then f32 fixed-point chains (exact)."""
    amax = jnp.max(jnp.abs(x))
    e = jnp.maximum(
        jnp.ceil(jnp.log2(amax + jnp.asarray(1e-30, x.dtype))) + 2.0, -90.0)
    scale = jnp.exp2(e)
    hi0 = x.astype(jnp.float32)
    lo0 = (x - hi0.astype(x.dtype)).astype(jnp.float32)
    inv = jnp.exp2(-e).astype(jnp.float32)
    hs = _chain_f32(hi0 * inv, n_slices)
    lo_skip = min(3, n_slices)
    ls = _chain_f32(lo0 * inv * jnp.float32(128.0 ** lo_skip),
                    n_slices - lo_skip)
    sl = [hs[k] if k < lo_skip else (hs[k] + ls[k - lo_skip])
          for k in range(n_slices)]
    return jnp.stack([s.astype(jnp.int8) for s in sl]), scale


def dc_add(Y, v):
    n, m = Y.shape[-2], Y.shape[-1]
    mask = ((jnp.arange(n) == 0).astype(Y.dtype)[:, None]
            * (jnp.arange(m) == 0).astype(Y.dtype)[None, :])
    return Y + v * mask


def dc_zero(X):
    n, m = X.shape[-2], X.shape[-1]
    keep = 1.0 - ((jnp.arange(n) == 0).astype(X.dtype)[:, None]
                  * (jnp.arange(m) == 0).astype(X.dtype)[None, :])
    return X * keep


def dot_left(c, u):
    return jax.lax.dot_general(c, u, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def dot_right(u, c):
    return jax.lax.dot_general(u, c, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def pair_groups(a_slices, b_slices, contract, max_pair):
    """All slice products a_i . b_j with i+j <= max_pair, summed into
    int32 groups by k = i + j."""
    Sa, Sb = a_slices.shape[0], b_slices.shape[0]
    groups = [None] * (max_pair + 1)
    for i in range(Sa):
        for j in range(min(Sb, max_pair + 1 - i)):
            p = contract(a_slices[i], b_slices[j])
            k = i + j
            groups[k] = p if groups[k] is None else groups[k] + p
    return groups


def renorm_to_slices(groups, n_slices):
    """Carry-renormalize int32 product groups into int8 slices, exactly."""
    q = SHIFT // 7
    low_slot = len(groups) + q
    acc = jnp.zeros_like(groups[0])
    slots = {}
    for j in range(low_slot, -1, -1):
        k = j - q - 1
        if 0 <= k < len(groups):
            acc = acc + groups[k]
        r = ((acc + 64) & 127) - 64
        slots[j] = r
        acc = (acc - r) >> 7
    zero = jnp.zeros_like(groups[0].astype(jnp.int8))
    return jnp.stack([slots[j].astype(jnp.int8) if j in slots else zero
                      for j in range(n_slices)])


def horner_f64(groups):
    acc = groups[-1].astype(jnp.float64)
    for k in range(len(groups) - 2, -1, -1):
        acc = acc * (2.0 ** -7) + groups[k].astype(jnp.float64)
    return acc * (2.0 ** -14)


def interleave(a, b, axis):
    stacked = jnp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def n_slots():
    return min(N_SLICES + SHIFT // 7, S2 + 1)


# --- the folded forward transform ------------------------------------------

def fwd_fold(U, fs):
    """Orthonormal 2-D DCT-II via folded int8 passes (f64 in/out)."""
    dtype = U.dtype
    n = U.shape[-1]
    h = n // 2
    m = jnp.mean(U)
    X = U - m
    u = X[:h] + X[h:][::-1]
    v = X[:h] - X[h:][::-1]
    n_field = min(N_SLICES, S1 + 1)
    us, su = slice_field(u, n_field)
    vs, sv = slice_field(v, n_field)
    ge = pair_groups(fs['CeS'], us, dot_left, S1)
    go = pair_groups(fs['CoS'], vs, dot_left, S1)

    def colfold(gs):
        p = [g[:, :h] + g[:, h:][:, ::-1] for g in gs]
        q = [g[:, :h] - g[:, h:][:, ::-1] for g in gs]
        return p, q

    pe, qe = colfold(ge)
    po, qo = colfold(go)
    quarters = []
    for grp, mcol, s in ((pe, 'CeTS', su), (qe, 'CoTS', su),
                         (po, 'CeTS', sv), (qo, 'CoTS', sv)):
        t = renorm_to_slices(grp, n_slots())
        g2 = pair_groups(t, fs[mcol], dot_right, S2)
        z = horner_f64(g2)
        quarters.append(z * (s * jnp.asarray(
            fs['scale'] * fs['scale'] * 2.0 ** SHIFT, dtype)))
    zee, zeo, zoe, zoo = quarters
    Y = interleave(interleave(zee, zeo, axis=1),
                   interleave(zoe, zoo, axis=1), axis=0)
    Y = jax.lax.optimization_barrier(Y)
    return dc_add(Y, m * n)


# --- the partial-inverse consumer (same int8 machinery) --------------------

def inv_core(y, fs):
    n = y.shape[-1]
    nf = min(N_SLICES, S1 + 1)
    ys, sy = slice_field(dc_zero(y), nf)
    a = pair_groups(fs['CeTS'], ys[:, 0::2, :], dot_left, S1)
    b = pair_groups(fs['CoTS'], ys[:, 1::2, :], dot_left, S1)
    wg = [jnp.concatenate([p + q, (p - q)[::-1, :]], axis=0)
          for p, q in zip(a, b)]
    t = renorm_to_slices(wg, n_slots())
    gE = pair_groups(t[:, :, 0::2], fs['CeS'], dot_right, S2)
    gO = pair_groups(t[:, :, 1::2], fs['CoS'], dot_right, S2)
    gl = [p + q for p, q in zip(gE, gO)]
    gr = [p - q for p, q in zip(gE, gO)]
    f = sy * jnp.asarray(fs['scale'] * fs['scale'] * 2.0 ** SHIFT,
                         jnp.float64)
    ul = horner_f64(gl) * f
    ur = horner_f64(gr)[:, ::-1] * f
    return jnp.concatenate([ul, ur], axis=1)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4, 8]
    fs = fold_slices(N)
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}  N={N}")
    bad = False
    for B in batches:
        x = jnp.asarray(
            0.875 * (1 + 0.01 * (rng.random((B, N, N)) - 0.5)))
        f1 = jax.jit(lambda u: fwd_fold(u, fs))
        y_ref = np.stack([np.asarray(f1(x[i])) for i in range(B)])

        def run(consumer, tag, expect_clean):
            def g(u):
                y = fwd_fold(u, fs)
                return y, consumer(y)
            yv, _ = jax.jit(jax.vmap(g))(x)
            err = float(np.max(np.abs(np.asarray(yv) - y_ref)))
            ok = err < 1e-9
            print(f"  B={B:3d} {tag:40s} fwd max|err| {err:.3e}"
                  f"  {'OK' if ok else 'CORRUPT'}", flush=True)
            return ok

        run(lambda y: inv_core(y, fs).sum() + y[0, 0] / N,
            'A scalar-after-reduce (control)', True)
        okB = run(lambda y: (inv_core(y, fs) + y[0, 0] / N).sum(),
                  'B gathered-scalar broadcast', False)
        okC = run(lambda y: (inv_core(y, fs) + 0.0 * y[0, 0]).sum(),
                  'C broadcast at ZERO weight', False)
        run(lambda y: (inv_core(y, fs) + jnp.mean(y)).sum(),
            'D broadcast of a reduce (control)', True)
        if B >= 8 and not (okB and okC):
            bad = True
    print('RESULT:', 'CORRUPTION REPRODUCED' if bad else 'clean')
    return 1 if bad else 0


if __name__ == '__main__':
    sys.exit(main())
