"""Ozaki-scheme f64 DCT: exact int8 MXU passes instead of emulated-f64 matmul.

TPU has no native f64; XLA emulates it in double-single (two f32s, ~49
significant bits) and an emulated-f64 matmul runs at ~2 Tops/s — it is 85%
of the float64 validation step (PERFORMANCE.md).  The MXU's *int8* path runs
at ~880 Tops/s on the same chip and its int8 x int8 -> int32 products are
EXACT.  The Ozaki splitting scheme (Ozaki et al., Numer. Algorithms 2012;
int8 revival: Ootomo et al. 2024) exploits that:

    x = sx * sum_i X_i 2^{-7(i+1)},  X_i int8 slices, |X_i| <= 64
    x @ y = sx*sy * sum_{i,j} (X_i @ Y_j) * 2^{-7(i+j+2)}

Each X_i @ Y_j is one exact int8 matmul (64*64*N < 2^31 for N <= 2^19); the
36 pairs with i+j <= 7 reconstruct >= 49 bits — everything the double-single
representation holds.  Measured accuracy of the full transform is *better*
than the emulated-f64 matmul it replaces (1.8e-15 vs 4.6e-15 max relative,
N=512), because the slice products carry no intermediate rounding at all.

Design choices for the Cahn-Hilliard hot loop (reference transform:
``scipy.fftpack.dctn/idctn`` at ``chsimpy/solver.py:201-208``):

* Slicing runs on the double-single components in *pure f32 VPU
  arithmetic* (cast -> hi, one emulated subtraction -> lo, then fixed-point
  round/subtract chains on each), not in emulated f64 — the f64 chain
  measured 37 ms for a 4096^2 field, the f32 form ~7 ms.
* The two 1-D passes of a 2-D transform are bridged entirely in int32:
  stage-1 product groups are carry-renormalized back to int8 slices
  (shifts/masks, exact), so the intermediate field is never recombined to
  f64.  One f64 Horner recombination per 2-D transform, at the very end.
* The DCT matrix slices are computed host-side in full f64 and cached.

The route is exposed as ``--transform ozaki`` (float64 only) and is the
'auto' choice for float64 on TPU.  On the CPU backend the same code runs
(int8 dots are exact everywhere), which is how the unit tests pin it
against scipy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .dct import _dct_matrix_np

N_SLICES = 8        # 7 payload bits per slice -> 56 bits >= the ~49 the
                    # double-single emulation holds
MAX_PAIR = 7        # keep slice products with i+j <= MAX_PAIR (36 passes)
# Pass-count cutoffs.  Naive trimming is unsafe: on DC-DOMINATED
# operands (the solver's hat_U!) the slice scale su is set by the DC
# coefficient, pushing every other entry's bits deep into the slice
# hierarchy, and the dropped products carry real precision (~100x error
# on roundtrips).  The transforms therefore SPLIT OFF the DC component
# analytically before slicing (dct2(ones) = N e00; idct2(e00) = ones/N)
# — after that, the measured accuracy matrix (PERFORMANCE.md) shows
# stage 1 <= 6 (28 passes) and stage 2 <= 8 (44) BEAT the previous
# full-count no-split config on both forward error and roundtrip while
# dropping 16 of 88 passes.
STAGE1_PAIR = 6     # 28 passes
STAGE2_PAIR = 8     # 44 passes
RENORM_SHIFT = 14   # static headroom (2 slice slots) absorbing the 1-D
                    # transform's growth |C @ U| <= sqrt(N) max|U|; covers
                    # N/(16 sqrt 2) <= 2^12 i.e. every N <= 92681


def slice_matrix_host(M: np.ndarray, n_slices: int = N_SLICES):
    """Exact fixed-point slicing of a constant f64 matrix on the host.

    Returns ``(slices, scale)`` with ``M = scale * sum_k slices[k] *
    2^{-7(k+1)}`` (+ a < 2^{-7 n_slices} scale tail), slices int8 in
    [-64, 64].  scale is a power of two with |M|/scale < 0.25."""
    amax = float(np.max(np.abs(M)))
    e = int(np.ceil(np.log2(amax))) + 2 if amax > 0 else 0
    scale = float(2.0 ** e)
    u = np.asarray(M, np.float64) / scale
    out = []
    for _ in range(n_slices):
        u = u * 128.0
        s = np.round(u)
        u = u - s
        out.append(s.astype(np.int8))
    return out, scale


@functools.lru_cache(maxsize=8)
def _dct_slices_np(N: int):
    """Host-cached int8 slice sets of the DCT matrix C and its transpose."""
    C = _dct_matrix_np(N)
    Cs, sc = slice_matrix_host(C)
    CsT = [s.T.copy() for s in Cs]
    return Cs, CsT, sc


def dct_slices(N: int):
    """Device int8 slice stacks ([S,N,N]) of C and C^T, plus their scale."""
    Cs, CsT, sc = _dct_slices_np(N)
    return (jnp.asarray(np.stack(Cs)), jnp.asarray(np.stack(CsT)), sc)


def dct_scale(N: int) -> float:
    """Static (host) scale of the DCT matrix slice set for grid size N."""
    return _dct_slices_np(N)[2]


def _slice_chain_f32(v, n_slices):
    """Fixed-position 7-bit slice chain in f32: s_k = round(v*128),
    v <- v*128 - s_k.  Exact: v has <= 24 mantissa bits, *128 is a pure
    exponent shift, and the subtraction cancels aligned bits."""
    out = []
    for _ in range(n_slices):
        v = v * jnp.float32(128.0)
        s = jnp.round(v)
        v = v - s
        out.append(s)
    return out


def slice_field(x, n_slices: int = N_SLICES):
    """Device slicing of an f64 field -> (int8 [S, ...], f64 scale scalar).

    The fixed-point chains run on the double-single hi/lo components in f32
    (fast VPU ops); only the hi/lo split itself is an emulated-f64
    subtraction.  Slice magnitudes: hi-chain <= 64+, lo-chain <= 64+, sum
    well inside int8 because |u| < 0.25 keeps the first slices <= 32."""
    amax = jnp.max(jnp.abs(x))
    # clamp: an all-zero field must not underflow the double-single
    # exponent range (~2^-126) in exp2
    e = jnp.maximum(
        jnp.ceil(jnp.log2(amax + jnp.asarray(1e-30, x.dtype))) + 2.0, -90.0)
    scale = jnp.exp2(e)
    # split FIRST, scale the components in f32: scale is a power of two,
    # so f32(x)*2^-e == f32(x/2^e) exactly — this replaces the emulated-f64
    # division of the whole field (the costliest op of the old chain) with
    # two exact f32 multiplies
    hi0 = x.astype(jnp.float32)
    lo0 = (x - hi0.astype(x.dtype)).astype(jnp.float32)
    inv = jnp.exp2(-e).astype(jnp.float32)
    hs = _slice_chain_f32(hi0 * inv, n_slices)
    ls = _slice_chain_f32(lo0 * inv, n_slices)
    sl = [(a + b).astype(jnp.int8) for a, b in zip(hs, ls)]
    return jnp.stack(sl), scale


def _pair_groups(a_slices, b_slices, contract, max_pair=MAX_PAIR):
    """All slice products a_i . b_j with i+j <= max_pair, summed into
    int32 groups by k = i+j.  ``contract(a, b)`` is one int8->int32 dot.
    Group sums stay < 2^31: each dot is <= 65*65*N and <= 8 dots join a
    group (N <= 2^19 safe)."""
    S = a_slices.shape[0]
    groups = [None] * (max_pair + 1)
    for i in range(S):
        for j in range(min(S, max_pair + 1 - i)):
            p = contract(a_slices[i], b_slices[j])
            k = i + j
            groups[k] = p if groups[k] is None else groups[k] + p
    return groups


def _dot_left(c, u):
    """c[i] @ u[j] for the left (row) transform pass."""
    return jax.lax.dot_general(c, u, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _dot_right(u, c):
    """u[i] @ c[j] for the right (column) transform pass."""
    return jax.lax.dot_general(u, c, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _renorm_to_slices(groups, n_slices: int = N_SLICES,
                      shift: int = RENORM_SHIFT):
    """Carry-renormalize int32 product groups into int8 slices, exactly.

    Input value V = sum_k groups[k] * 2^{-7(k+2)}.  Output slices r_j in
    the :func:`slice_field` convention, V * 2^{-shift} = sum_j r_j *
    2^{-7(j+1)} — ready to feed the next matmul stage at scale
    (old_scale * 2^shift).  Pure int32 shifts/masks; the centered mod
    keeps |r_j| <= 64.  Group k lands at slot j = k + shift/7 + 1; slots
    past n_slices-1 are dropped (their weight is < 2^-7 n_slices of the
    renormalized value — below the double-single floor for the DCT's
    growth bound) and the carry above slot 0 is zero whenever
    |V| < 2^{shift-1} (the transform guarantees |V| <= N/(16 sqrt 2),
    far inside for practical N)."""
    assert shift % 7 == 0, "shift must be a whole number of slice slots"
    q = shift // 7
    n_groups = len(groups)
    # group k sits at output slot j = k + q + 1
    low_slot = n_groups + q         # least significant occupied slot
    acc = jnp.zeros_like(groups[0])
    slices = {}
    for j in range(low_slot, -1, -1):
        k = j - q - 1
        if 0 <= k < n_groups:
            acc = acc + groups[k]
        r = ((acc + 64) & 127) - 64
        slices[j] = r
        acc = (acc - r) >> 7
    zero = jnp.zeros_like(groups[0].astype(jnp.int8))
    return jnp.stack([slices[j].astype(jnp.int8) if j in slices else zero
                      for j in range(n_slices)])


def _horner_f64(groups, dtype=jnp.float64):
    """sum_k groups[k] * 2^{-7(k+2)} recombined in f64 (one Horner pass)."""
    acc = groups[-1].astype(dtype)
    for k in range(len(groups) - 2, -1, -1):
        acc = acc * dtype(2.0 ** -7) + groups[k].astype(dtype)
    return acc * dtype(2.0 ** -14)


def _transform2d(U, Ms_row, Ms_col, m_scale):
    """M_row @ U @ M_col with both stages in int8/int32.

    Ms_row/Ms_col are [S,N,N] int8 slice stacks of the two constant
    matrices (same scale m_scale); U is the f64 field."""
    dtype = U.dtype
    q = RENORM_SHIFT // 7
    Us, su = slice_field(U)
    g1 = _pair_groups(Ms_row, Us, _dot_left, max_pair=STAGE1_PAIR)
    # the 2^RENORM_SHIFT static headroom occupies the top q slots of the
    # renormalized stack; emit q extra slices so the stage-2 input keeps
    # the 2^-56 absolute resolution (the STAGE2_PAIR cutoff then trims
    # only sub-floor products — see the constants above)
    t = _renorm_to_slices(g1, n_slices=N_SLICES + q)
    g2 = _pair_groups(t, Ms_col, _dot_right, max_pair=STAGE2_PAIR)
    z = _horner_f64(g2, jnp.dtype(dtype).type)
    # total scale: (m_scale * su * 2^RENORM_SHIFT) from stage 1 * m_scale
    z = z * (su * jnp.asarray(
        m_scale * m_scale * 2.0 ** RENORM_SHIFT, dtype))
    # materialize: downstream consumers (the six stat reductions of the
    # step) must not re-fuse/duplicate the 10-group Horner chain
    return jax.lax.optimization_barrier(z)


def dct2_ozaki(U, Cs, CsT, m_scale, constrain=lambda x: x):
    """Orthonormal 2-D DCT-II (C @ U @ C^T) via exact int8 passes.
    Matches :func:`chsimpy_tpu.ops.dct.dct2` to ~1e-15 relative.

    The field's mean rides around the int8 path analytically
    (dct2(ones) = N e00): subtracting it shrinks the slice scale by the
    DC/fluctuation ratio, recovering deep-bit precision (see the cutoff
    note above)."""
    U = constrain(U)
    N = U.shape[-1]
    m = jnp.mean(U)
    Y = _transform2d(U - m, Cs, CsT, m_scale)
    return Y.at[0, 0].add(m * N)


def idct2_ozaki(X, Cs, CsT, m_scale, constrain=lambda x: x):
    """Orthonormal 2-D DCT-III (C^T @ X @ C), inverse of
    :func:`dct2_ozaki`.  The DC coefficient is split off analytically
    (idct2(e00) = ones/N) before slicing."""
    X = constrain(X)
    N = X.shape[-1]
    d = X[0, 0]
    u = _transform2d(X.at[0, 0].set(0.0), CsT, Cs, m_scale)
    return u + d / N
