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
# Round 2.8 trim (measured sweep, N=256 CPU true-f64, DC-split active):
#   (s1, s2)  passes  fwd gauss  fwd solver-class  20-roundtrip solver
#   (6, 8)    28+44   1.1e-13    4.0e-15           2.2e-14
#   (5, 7)    21+36   1.3e-11    4.0e-15           2.6e-12
#   (5, 6)    21+28   7.3e-10    1.2e-14           1.4e-10   <- too close
#   (4, 6)    15+28   1.5e-09    2.6e-14           3.0e-10   <- too close
# (5, 7) keeps the solver-class forward error AT the f64 floor and the
# accumulated roundtrip error two orders under the 1e-10 E contract while
# dropping 15 of 72 passes; the next trim step parks within one order of
# the contract — rejected.  Gate: the on-chip canonical N=512 run must
# keep the exact stop step and <=1e-10 E (PERFORMANCE.md round 2.8).
STAGE1_PAIR = 5     # 21 passes
STAGE2_PAIR = 7     # 36 passes
RENORM_SHIFT = 14   # static headroom (2 slice slots) absorbing the 1-D
                    # transform's growth |C @ U| <= sqrt(N) max|U|; covers
                    # N/(16 sqrt 2) <= 2^12 i.e. every N <= 92681


def slice_matrix_host(M: np.ndarray, n_slices: int = N_SLICES,
                      scale: float = None):
    """Exact fixed-point slicing of a constant f64 matrix on the host.

    Returns ``(slices, scale)`` with ``M = scale * sum_k slices[k] *
    2^{-7(k+1)}`` (+ a < 2^{-7 n_slices} scale tail), slices int8 in
    [-64, 64].  scale is a power of two with |M|/scale < 0.25; pass an
    explicit ``scale`` to share it across matrices whose int32 product
    groups must be added exactly (the folded route's e/o blocks)."""
    if scale is None:
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


@functools.lru_cache(maxsize=8)
def _dct_fold_slices_np(N: int):
    """Host-cached int8 slice sets of the level-1 folded DCT blocks.

    The DCT-II matrix's cosine symmetry C[k, N-1-n] = (-1)^k C[k, n]
    splits every contraction with C into two half-size ones (the same
    identity the f32 split route exploits, ops/dct.py):

        (C @ x)[even k] = Ce @ (x_top + flip(x_bot)),   Ce = C[0::2, :N/2]
        (C @ x)[odd  k] = Co @ (x_top - flip(x_bot)),   Co = C[1::2, :N/2]

    All four block stacks (Ce, Co and their transposes) share ONE slice
    scale: the folded transforms add int32 product groups ACROSS the e/o
    branches (inverse assembly), which is exact only at a common scale.
    max|Ce| <= max|Co| (Ce's extra k=0 row is the smallest-magnitude
    one), so the shared scale costs Ce no slice depth in practice."""
    C = _dct_matrix_np(N)
    h = N // 2
    Ce = np.ascontiguousarray(C[0::2, :h])
    Co = np.ascontiguousarray(C[1::2, :h])
    amax = max(float(np.max(np.abs(Ce))), float(np.max(np.abs(Co))))
    e = int(np.ceil(np.log2(amax))) + 2 if amax > 0 else 0
    sc = float(2.0 ** e)
    CeS, _ = slice_matrix_host(Ce, scale=sc)
    CoS, _ = slice_matrix_host(Co, scale=sc)
    return (CeS, CoS, [s.T.copy() for s in CeS], [s.T.copy() for s in CoS],
            sc)


def dct_fold_slices(N: int):
    """Device int8 slice stacks ([S, N/2, N/2]) of the folded DCT blocks
    Ce, Co, Ce^T, Co^T plus their shared scale."""
    CeS, CoS, CeTS, CoTS, sc = _dct_fold_slices_np(N)
    return {'CeS': jnp.asarray(np.stack(CeS)),
            'CoS': jnp.asarray(np.stack(CoS)),
            'CeTS': jnp.asarray(np.stack(CeTS)),
            'CoTS': jnp.asarray(np.stack(CoTS)),
            'scale': sc}


def dct_fold_scale(N: int) -> float:
    """Static (host) shared scale of the folded DCT block slice sets."""
    return _dct_fold_slices_np(N)[4]


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
    # the lo component's first three slices are identically zero:
    # |lo| <= ulp(hi)/2 <= 2^-24 |u| <= 2^-26 (the scale keeps |u| <= 0.25),
    # so 128^3 |lo| < 0.5 rounds to 0 at every lane — start the lo chain at
    # slice 3 with one exact power-of-two scaling
    lo_skip = min(3, n_slices)
    ls = _slice_chain_f32(lo0 * inv * jnp.float32(128.0 ** lo_skip),
                          n_slices - lo_skip)
    sl = [hs[k] if k < lo_skip else (hs[k] + ls[k - lo_skip])
          for k in range(n_slices)]
    sl = [s.astype(jnp.int8) for s in sl]
    return jnp.stack(sl), scale


def _slice_kernel(n_slices, lo_skip, inv_ref, hi_ref, lo_ref, out_ref):
    """Pallas: both fixed-point chains run in registers; one read of the
    double-single components, one int8 write per slice — the XLA form
    materializes intermediates of the 13-step sequential chain in HBM."""
    inv = inv_ref[0]
    h = hi_ref[:] * inv
    low = lo_ref[:] * (inv * jnp.float32(128.0 ** lo_skip))
    for k in range(n_slices):
        h = h * jnp.float32(128.0)
        s = jnp.round(h)
        h = h - s
        if k >= lo_skip:
            low = low * jnp.float32(128.0)
            t = jnp.round(low)
            low = low - t
            s = s + t
        out_ref[k] = s.astype(jnp.int8)


def slice_field_pallas(x, n_slices: int = N_SLICES):
    """:func:`slice_field` with the chains fused in one Pallas pass
    (TPU float64 path under ``kernel_backend='pallas'``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .pallas_kernels import _interpret, _tile, _whole

    amax = jnp.max(jnp.abs(x))
    e = jnp.maximum(
        jnp.ceil(jnp.log2(amax + jnp.asarray(1e-30, x.dtype))) + 2.0, -90.0)
    scale = jnp.exp2(e)
    hi0 = x.astype(jnp.float32)
    lo0 = (x - hi0.astype(x.dtype)).astype(jnp.float32)
    inv = jnp.exp2(-e).astype(jnp.float32).reshape((1,))
    lo_skip = min(3, n_slices)
    N, M = x.shape
    tn, tm = _tile(N), _tile(M)
    spec = pl.BlockSpec((tn, tm), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_slice_kernel, n_slices, lo_skip),
        out_shape=jax.ShapeDtypeStruct((n_slices, N, M), jnp.int8),
        grid=(N // tn, M // tm),
        in_specs=[_whole((1,), pltpu.SMEM), spec, spec],
        out_specs=pl.BlockSpec((n_slices, tn, tm),
                               lambda i, j: (jnp.int32(0), i, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(inv, hi0, lo0)
    return out, scale


def _dc_add(Y, v):
    """Y with v added at [0, 0] — as exact mask arithmetic, NOT a
    scatter: under vmap on real TPU, the batched scatter/gather pair the
    ``.at[0, 0]`` forms lower to miscomputes when the forward and
    inverse fuse into one program (measured round 4: vmapped fold/rfold
    roundtrips off by 5e-10..9e-3 — DC-scale — while each half alone is
    exact; scripts/probes/vmap_oz_transform.py / vmap_oz_rfold.py), and
    the batched scatter also serializes (the 40x vmapped-f64 ensemble
    slowdown).  Mask arithmetic is bit-identical semantics: +0.0
    everywhere else, *1.0 everywhere else."""
    n, m = Y.shape[-2], Y.shape[-1]
    mask = ((jnp.arange(n) == 0).astype(Y.dtype)[:, None]
            * (jnp.arange(m) == 0).astype(Y.dtype)[None, :])
    return Y + v * mask


def _dc_zero(X):
    """X with [0, 0] zeroed — mask arithmetic, not a scatter (see
    :func:`_dc_add`)."""
    n, m = X.shape[-2], X.shape[-1]
    keep = 1.0 - ((jnp.arange(n) == 0).astype(X.dtype)[:, None]
                  * (jnp.arange(m) == 0).astype(X.dtype)[None, :])
    return X * keep


def _pair_groups(a_slices, b_slices, contract, max_pair=MAX_PAIR):
    """All slice products a_i . b_j with i+j <= max_pair, summed into
    int32 groups by k = i+j.  ``contract(a, b)`` is one int8->int32 dot.
    Group sums stay < 2^31: each dot is <= 65*65*N and <= 8 dots join a
    group (N <= 2^19 safe)."""
    Sa, Sb = a_slices.shape[0], b_slices.shape[0]
    groups = [None] * (max_pair + 1)
    for i in range(Sa):
        for j in range(min(Sb, max_pair + 1 - i)):
            p = contract(a_slices[i], b_slices[j])
            k = i + j
            groups[k] = p if groups[k] is None else groups[k] + p
    return groups


def _pair_groups_fused(a_stack, b_stack, max_pair=MAX_PAIR):
    """Group sums as single multi-contraction dots.

    group_k = sum_{i+j=k} a[i] @ b[j] == dot_general(a[i0:i1+1],
    rev(b)[...], contracting dims ((0, 2), (0, 1))) — the pair index
    becomes an extra contraction axis, so the per-pair int32 product
    fields (one 67 MB HBM write + read-back EACH at N=4096 in the
    pairwise form) never leave the MXU accumulator.  Operands are
    contiguous prefix/suffix views of the slice stacks (a: ascending i,
    b: descending j via one reversed copy) — no per-group operand
    builds, unlike the measured-slower concatenation variant
    (PERFORMANCE.md 'grouped contraction' note).  Group sums stay exact:
    the int32 MXU accumulator bound is unchanged (<= 8 pairs x 65*65*N
    < 2^31 for N <= 2^19)."""
    Sa, Sb = a_stack.shape[0], b_stack.shape[0]
    b_rev = b_stack[::-1]
    groups = []
    for k in range(max_pair + 1):
        i0, i1 = max(0, k - (Sb - 1)), min(k, Sa - 1)
        ga = a_stack[i0:i1 + 1]
        gb = b_rev[Sb - 1 - k + i0: Sb - 1 - k + i1 + 1]
        groups.append(jax.lax.dot_general(
            ga, gb, (((0, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32))
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


def _transform2d(U, Ms_row, Ms_col, m_scale, pallas_slice=False,
                 fused_groups=False, constrain_mid=lambda t: t,
                 right_first=False, s1=STAGE1_PAIR, s2=STAGE2_PAIR):
    """M_row @ U @ M_col with both stages in int8/int32.

    Ms_row/Ms_col are [S,N,N] int8 slice stacks of the two constant
    matrices (same scale m_scale); U is the f64 field.

    ``constrain_mid`` pins the renormalized int8 slice stack between the
    stages — under the pencil layout (parallel/sharding.py) this is the
    transpose all-to-all, moving 8 int8 slots = exactly one
    f64-field-equivalent of bytes (8x less wire than the GSPMD-sharded
    2-D contraction's partial-shard gathers).  ``right_first`` swaps the
    stage order (column stage first) so the INVERSE contracts a local
    axis on a row-sharded spectral operand — the same stage swap the
    pencil split inverse uses.  Both stages contract exact int8/int32
    arithmetic, so any partitioning of the dots is bit-identical."""
    dtype = U.dtype
    q = RENORM_SHIFT // 7
    # the pair cutoffs bound which slice indices any dot ever consumes:
    # stage 1 reads field slices j <= s1 (the matrix is always operand
    # i), stage 2 reads renormalized slots i <= s2 — emitting more is
    # pure waste, so the chains stop there (the dropped slices changed
    # no dot; results are bit-identical).  The defaults are the
    # contract-validated (5, 7); the FORWARD transform of the solver's
    # nonlinear term may pass trimmed values (its error rides the
    # semi-implicit damping — see stepper.py / PERFORMANCE.md round 4)
    n_field = min(N_SLICES, s1 + 1)
    Us, su = (slice_field_pallas(U, n_field) if pallas_slice
              else slice_field(U, n_field))
    # the 2^RENORM_SHIFT static headroom occupies the top q slots of the
    # renormalized stack, so slot resolution runs to 2^-7(N_SLICES+q)
    # in principle — but stage 2 only ever reads slots i <= s2
    # (its pair cutoff), so emission stops there
    n_slots = min(N_SLICES + q, s2 + 1)
    if right_first:
        # column stage first (pencil inverse): U @ Ms_col -> reshard ->
        # Ms_row @ .  Exact stage swap of the separable transform; the
        # int arithmetic makes it value-identical up to the final f64
        # Horner's summation nesting.
        g1 = _pair_groups(Us, Ms_col, _dot_right, max_pair=s1)
        t = constrain_mid(_renorm_to_slices(g1, n_slices=n_slots))
        g2 = _pair_groups(Ms_row, t, _dot_left, max_pair=s2)
    elif fused_groups:
        g1 = _pair_groups_fused(Ms_row, Us, max_pair=s1)
        t = constrain_mid(_renorm_to_slices(g1, n_slices=n_slots))
        g2 = _pair_groups_fused(t, Ms_col, max_pair=s2)
    else:
        g1 = _pair_groups(Ms_row, Us, _dot_left, max_pair=s1)
        t = constrain_mid(_renorm_to_slices(g1, n_slices=n_slots))
        g2 = _pair_groups(t, Ms_col, _dot_right, max_pair=s2)
    z = _horner_f64(g2, jnp.dtype(dtype).type)
    # total scale: (m_scale * su * 2^RENORM_SHIFT) from stage 1 * m_scale
    z = z * (su * jnp.asarray(
        m_scale * m_scale * 2.0 ** RENORM_SHIFT, dtype))
    # materialize: downstream consumers (the six stat reductions of the
    # step) must not re-fuse/duplicate the 10-group Horner chain
    return jax.lax.optimization_barrier(z)


def dct2_ozaki(U, Cs, CsT, m_scale, constrain=lambda x: x,
               pallas_slice=False, fused_groups=False,
               constrain_mid=lambda t: t,
               s1=STAGE1_PAIR, s2=STAGE2_PAIR):
    """Orthonormal 2-D DCT-II (C @ U @ C^T) via exact int8 passes.
    Matches :func:`chsimpy_tpu.ops.dct.dct2` to ~1e-15 relative.

    The field's mean rides around the int8 path analytically
    (dct2(ones) = N e00): subtracting it shrinks the slice scale by the
    DC/fluctuation ratio, recovering deep-bit precision (see the cutoff
    note above).

    Pencil sharding: pass the SPECTRAL pencil constrainer as
    ``constrain_mid`` — the row stage contracts the (local) row axis of
    the column-sharded field, the int8 slice stack transposes in one
    all-to-all, the column stage contracts locally."""
    U = constrain(U)
    N = U.shape[-1]
    m = jnp.mean(U)
    Y = _transform2d(U - m, Cs, CsT, m_scale, pallas_slice=pallas_slice,
                     fused_groups=fused_groups, constrain_mid=constrain_mid,
                     s1=s1, s2=s2)
    return _dc_add(Y, m * N)


def idct2_ozaki(X, Cs, CsT, m_scale, constrain=lambda x: x,
                pallas_slice=False, fused_groups=False,
                constrain_mid=lambda t: t, pencil=False):
    """Orthonormal 2-D DCT-III (C^T @ X @ C), inverse of
    :func:`dct2_ozaki`.  The DC coefficient is split off analytically
    (idct2(e00) = ones/N) before slicing.

    ``pencil`` swaps the stage order (column stage first) so the
    row-sharded spectral operand contracts a local axis;
    ``constrain_mid`` then pins the mid int8 stack to the FIELD pencil
    sharding (the transpose all-to-all back)."""
    X = constrain(X)
    N = X.shape[-1]
    d = X[0, 0]
    u = _transform2d(_dc_zero(X), CsT, Cs, m_scale,
                     pallas_slice=pallas_slice, fused_groups=fused_groups,
                     constrain_mid=constrain_mid, right_first=pencil)
    return u + d / N


# ---------------------------------------------------------------------------
# Level-1 folded ozaki transforms (round 3): the DCT cosine symmetry halves
# the int8 MAC count of BOTH stages (the same fold the f32 split route
# uses), with every e/o bridge kept exact in int32 — group planes from the
# two branches share the matrix slice scale (see _dct_fold_slices_np), so
# their sums/differences are exact integer arithmetic.  Natural layout in
# and out: a drop-in replacement for dct2_ozaki/idct2_ozaki on one device.
#
# Bound bookkeeping vs the unfolded route: a folded dot contracts over N/2
# (<= 65*65*N/2 per dot) and the e/o group adds double that — the int32
# group bound is unchanged (33800*N < 2^31 for N <= 63550); the renorm
# headroom |V| < 2^{RENORM_SHIFT-1} absorbs the doubled fold values up to
# N/(8 sqrt 2) <= 2^13, i.e. every N <= 46340.
# ---------------------------------------------------------------------------

def _interleave(a, b, axis):
    """Riffle a and b along ``axis``: result[2i] = a[i], result[2i+1] =
    b[i] (the natural order of even/odd spectral indices)."""
    stacked = jnp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def _n_slots(s2=STAGE2_PAIR):
    q = RENORM_SHIFT // 7
    return min(N_SLICES + q, s2 + 1)


def dct2_ozaki_fold(U, fs, constrain=lambda x: x, pallas_slice=False,
                    s1=STAGE1_PAIR, s2=STAGE2_PAIR):
    """Orthonormal 2-D DCT-II via folded int8 passes (half the MACs of
    :func:`dct2_ozaki`, same accuracy class).  ``fs`` is
    :func:`dct_fold_slices`(N)."""
    U = constrain(U)
    dtype = U.dtype
    N = U.shape[-1]
    h = N // 2
    m = jnp.mean(U)
    X = U - m
    # row fold (f64: two VPU adds per element)
    u = X[:h] + X[h:][::-1]
    v = X[:h] - X[h:][::-1]
    n_field = min(N_SLICES, s1 + 1)
    sl = slice_field_pallas if pallas_slice else slice_field
    us, su = sl(u, n_field)
    vs, sv = sl(v, n_field)
    # stage 1: T_even = Ce @ u, T_odd = Co @ v — half-size contractions
    ge = _pair_groups(fs['CeS'], us, _dot_left, max_pair=s1)
    go = _pair_groups(fs['CoS'], vs, _dot_left, max_pair=s1)

    # column fold at the int32 group level (linear, exact)
    def colfold(gs):
        p = [g[:, :h] + g[:, h:][:, ::-1] for g in gs]
        q = [g[:, :h] - g[:, h:][:, ::-1] for g in gs]
        return p, q

    pe, qe = colfold(ge)
    po, qo = colfold(go)
    ns = _n_slots(s2)
    # stage 2 per quarter: Z[eo-rows, eo-cols]; row-block scales (su/sv)
    # stay separable because the column pass never mixes rows
    quarters = []
    for grp, mcol, s in ((pe, 'CeTS', su), (qe, 'CoTS', su),
                         (po, 'CeTS', sv), (qo, 'CoTS', sv)):
        t = _renorm_to_slices(grp, n_slices=ns)
        g2 = _pair_groups(t, fs[mcol], _dot_right, max_pair=s2)
        z = _horner_f64(g2, jnp.dtype(dtype).type)
        quarters.append(z * (s * jnp.asarray(
            fs['scale'] * fs['scale'] * 2.0 ** RENORM_SHIFT, dtype)))
    zee, zeo, zoe, zoo = quarters
    Y = _interleave(_interleave(zee, zeo, axis=1),
                    _interleave(zoe, zoo, axis=1), axis=0)
    Y = jax.lax.optimization_barrier(Y)
    return _dc_add(Y, m * N)


# ---------------------------------------------------------------------------
# Recursive folded ozaki in the PERMUTED basis (round 4).
#
# Generalizes the level-1 fold to L levels (MAC fractions 1/2, 3/8, 11/32
# of the unfolded route at L = 1, 2, 3 — the same tree as the f32 split
# route) and emits the split route's permuted block order on both axes:
# [E-leaf, O_L, ..., O_1] instead of interleaved even/odd.  The CH stepper
# only touches spectral space elementwise, so the permutation is conjugated
# into the coefficient grids once at setup (split_permute_grid) — and the
# interleave relayouts AND the inverse's strided 0::2 gathers of the int8
# stacks disappear (contiguous block slices instead).
#
# Exactness bookkeeping:
# * forward — each row branch b is folded in f64 (VPU adds), sliced at its
#   OWN scale su_b; no cross-branch adds ever happen (row blocks come from
#   exactly one branch; the column fold adds int32 groups of the SAME
#   branch), so per-branch scales are free.
# * inverse — the spectral operand is sliced ONCE (branch sub-stacks are
#   contiguous row/col slices of one stack), and all block matrices share
#   ONE slice scale (dct_rfold_slices), so the cross-branch assemblies
#   [a + b; flip(a - b)] are exact int32 adds.
# * int32 bounds — a dot contracts over <= N/2^l rows (<= 65*65*N/2^l),
#   <= 8 pairs join a group, and the L nested fold assemblies double
#   values L times: bound 65*65*N*8*2^L / 2^l.  Worst case (l = L leaf,
#   factor N*2^L/2^L = N) gives 65*65*8*N*2^L < 2^31 — N <= 8192 safe for
#   L <= 2, N <= 4096 for L <= 3 (the resolver gates on this).
# * renorm headroom — |V| <= 2^L * N/(16 sqrt 2) must stay < 2^13:
#   N <= 23170 at L = 2, 11585 at L = 3.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _rfold_blocks_np(N: int, levels: int):
    """Block matrices of the split tree in permuted branch order
    [E-leaf, O_levels, ..., O_1], plus one shared slice scale."""
    C = _dct_matrix_np(N)

    def rec(M, lv):
        n = M.shape[1]
        if lv == 0 or n % 2:
            return [np.ascontiguousarray(M)]
        return rec(M[0::2, :n // 2], lv - 1) + [
            np.ascontiguousarray(M[1::2, :n // 2])]

    blocks = rec(C, levels)
    amax = max(float(np.max(np.abs(b))) for b in blocks)
    e = int(np.ceil(np.log2(amax))) + 2 if amax > 0 else 0
    sc = float(2.0 ** e)
    return blocks, sc


@functools.lru_cache(maxsize=16)
def _dct_rfold_slices_np(N: int, levels: int):
    blocks, sc = _rfold_blocks_np(N, levels)
    out = []
    for b in blocks:
        S, _ = slice_matrix_host(b, scale=sc)
        out.append((np.stack(S), np.stack([s.T.copy() for s in S])))
    return out, sc


def dct_rfold_slices(N: int, levels: int):
    """Device int8 slice stacks of the recursive fold blocks: tuple of
    (block, block^T) stacks in branch order, plus the shared scale."""
    np_blocks, sc = _dct_rfold_slices_np(N, levels)
    return (tuple((jnp.asarray(s), jnp.asarray(st))
                  for s, st in np_blocks), sc)


def dct_rfold_scale(N: int, levels: int) -> float:
    """Static (host) shared scale of the recursive fold block slices."""
    return _dct_rfold_slices_np(N, levels)[1]


def _rfold_field(X, levels):
    """Row-branch inputs [u_E, v_L, ..., v_1] of the recursive fold
    (f64 VPU adds; total rows = N)."""
    if levels == 0:
        return [X]
    n = X.shape[0]
    top, bot = X[:n // 2], X[n // 2:][::-1]
    return _rfold_field(top + bot, levels - 1) + [top - bot]


def _rfold_groups_cols(groups, levels):
    """Column branches of int32 group planes, same order (exact adds)."""
    if levels == 0:
        return [groups]
    h = groups[0].shape[1] // 2
    top = [g[:, :h] for g in groups]
    bot = [g[:, h:][:, ::-1] for g in groups]
    plus = [a + b for a, b in zip(top, bot)]
    minus = [a - b for a, b in zip(top, bot)]
    return _rfold_groups_cols(plus, levels - 1) + [minus]


def dct2_ozaki_rfold(U, rf, m_scale, levels, constrain=lambda x: x,
                     pallas_slice=False, s1=STAGE1_PAIR, s2=STAGE2_PAIR):
    """Orthonormal 2-D DCT-II via recursive folded int8 passes, PERMUTED
    block order on both axes (conjugate CHeig/Seig with
    ``dct.split_permute_grid(..., levels)``).  ``rf`` is
    :func:`dct_rfold_slices`(N, levels)[0]."""
    U = constrain(U)
    dtype = U.dtype
    N = U.shape[-1]
    m = jnp.mean(U)
    sl = slice_field_pallas if pallas_slice else slice_field
    n_field = min(N_SLICES, s1 + 1)
    ns = _n_slots(s2)
    branches = _rfold_field(U - m, levels)
    row_blocks = []
    for b, (Bs, _BsT) in zip(branches, rf):
        us, su = sl(b, n_field)
        g1 = _pair_groups(Bs, us, _dot_left, max_pair=s1)
        col_blocks = []
        for gc, (_Cs2, CsT2) in zip(_rfold_groups_cols(g1, levels), rf):
            t = _renorm_to_slices(gc, n_slices=ns)
            g2 = _pair_groups(t, CsT2, _dot_right, max_pair=s2)
            z = _horner_f64(g2, jnp.dtype(dtype).type)
            col_blocks.append(z * (su * jnp.asarray(
                m_scale * m_scale * 2.0 ** RENORM_SHIFT, dtype)))
        row_blocks.append(jnp.concatenate(col_blocks, axis=1))
    Y = jax.lax.optimization_barrier(jnp.concatenate(row_blocks, axis=0))
    # permuted index of spectral (0, 0) is 0 (the even-first recursion
    # keeps index 0 in place)
    return _dc_add(Y, m * N)


def _rfold_inv_rows(t, rf, levels, row0=0, size=None, s1=STAGE1_PAIR):
    """Stage 1 of the inverse: int32 groups of C^T X from the sliced
    permuted operand ``t`` ([S, N, N]); recursion assembles
    [a + b; flip(a - b)] at the group level (exact: one slice scale, one
    matrix scale)."""
    if size is None:
        size = t.shape[1]
    h = size // 2
    # branch layout within [row0, row0+size): [even-part..., O at this level]
    if levels == 0:
        Bs, BsT = rf[0]
        sub = t[:, row0:row0 + size, :]
        return _pair_groups(BsT, sub, _dot_left, max_pair=s1)
    o_idx = levels  # rf index of this level's odd block: [E, O_L, .., O_1]
    a = _rfold_inv_rows(t, rf[:o_idx], levels - 1, row0, h, s1=s1)
    _Bs, BoT = rf[o_idx]
    sub = t[:, row0 + h:row0 + size, :]
    b = _pair_groups(BoT, sub, _dot_left, max_pair=s1)
    return [jnp.concatenate([x + y, (x - y)[::-1, :]], axis=0)
            for x, y in zip(a, b)]


def _rfold_inv_cols(t, rf, levels, col0=0, size=None, s2=STAGE2_PAIR):
    """Stage 2 of the inverse along columns (same recursion, axis 1)."""
    if size is None:
        size = t.shape[2]
    h = size // 2
    if levels == 0:
        Bs, _BsT = rf[0]
        sub = t[:, :, col0:col0 + size]
        return _pair_groups(sub, Bs, _dot_right, max_pair=s2)
    o_idx = levels
    a = _rfold_inv_cols(t, rf[:o_idx], levels - 1, col0, h, s2=s2)
    Bo, _BoT = rf[o_idx]
    sub = t[:, :, col0 + h:col0 + size]
    b = _pair_groups(sub, Bo, _dot_right, max_pair=s2)
    return [jnp.concatenate([x + y, (x - y)[:, ::-1]], axis=1)
            for x, y in zip(a, b)]


def idct2_ozaki_rfold(X, rf, m_scale, levels, constrain=lambda x: x,
                      pallas_slice=False, s1=STAGE1_PAIR, s2=STAGE2_PAIR):
    """Orthonormal 2-D DCT-III from the permuted basis, inverse of
    :func:`dct2_ozaki_rfold`.  ONE slice call, ONE renorm, contiguous
    block reads (no strided gathers).  ``s1``/``s2`` trim the pair
    cutoffs like the forward's — the default (5, 7) is the validated
    contract; see resolve_ozaki_inv_pairs for the measured basis of any
    trim."""
    X = constrain(X)
    dtype = X.dtype
    d = X[0, 0]
    N = X.shape[-1]
    sl = slice_field_pallas if pallas_slice else slice_field
    n_field = min(N_SLICES, s1 + 1)
    ys, sy = sl(_dc_zero(X), n_field)
    g1 = _rfold_inv_rows(ys, rf, levels, s1=s1)
    t = _renorm_to_slices(g1, n_slices=_n_slots(s2))
    g2 = _rfold_inv_cols(t, rf, levels, s2=s2)
    u = _horner_f64(g2, jnp.dtype(dtype).type) * (sy * jnp.asarray(
        m_scale * m_scale * 2.0 ** RENORM_SHIFT, dtype))
    return jax.lax.optimization_barrier(u) + d / N


def idct2_ozaki_fold(X, fs, constrain=lambda x: x, pallas_slice=False):
    """Orthonormal 2-D DCT-III, inverse of :func:`dct2_ozaki_fold`
    (folded int8 passes, natural layout in/out).

    The spectral operand is sliced ONCE at a global scale, so the e/o
    row/column sub-stacks share it and the fold assemblies (a+b, a-b)
    stay exact int32 adds."""
    X = constrain(X)
    dtype = X.dtype
    N = X.shape[-1]
    h = N // 2
    d = X[0, 0]
    n_field = min(N_SLICES, STAGE1_PAIR + 1)
    sl = slice_field_pallas if pallas_slice else slice_field
    ys, sy = sl(_dc_zero(X), n_field)
    # stage 1: x = C^T y; x_top = Ce^T yE + Co^T yO,
    #          x_bot = flip(Ce^T yE - Co^T yO)
    yE = ys[:, 0::2, :]
    yO = ys[:, 1::2, :]
    a = _pair_groups(fs['CeTS'], yE, _dot_left, max_pair=STAGE1_PAIR)
    b = _pair_groups(fs['CoTS'], yO, _dot_left, max_pair=STAGE1_PAIR)
    wg = [jnp.concatenate([x + y, (x - y)[::-1, :]], axis=0)
          for x, y in zip(a, b)]
    t = _renorm_to_slices(wg, n_slices=_n_slots())
    # stage 2: u = w C; u_left = wE Ce + wO Co, u_right = flip(wE Ce - wO Co)
    wE = t[:, :, 0::2]
    wO = t[:, :, 1::2]
    gE = _pair_groups(wE, fs['CeS'], _dot_right, max_pair=STAGE2_PAIR)
    gO = _pair_groups(wO, fs['CoS'], _dot_right, max_pair=STAGE2_PAIR)
    gl = [x + y for x, y in zip(gE, gO)]
    gr = [x - y for x, y in zip(gE, gO)]
    f = sy * jnp.asarray(fs['scale'] * fs['scale'] * 2.0 ** RENORM_SHIFT,
                         dtype)
    ul = _horner_f64(gl, jnp.dtype(dtype).type) * f
    ur = _horner_f64(gr, jnp.dtype(dtype).type)[:, ::-1] * f
    u = jax.lax.optimization_barrier(jnp.concatenate([ul, ur], axis=1))
    return u + d / N
