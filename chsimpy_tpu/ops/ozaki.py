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


def _pair_plan(Sa, Sb, max_pair):
    """Static pair schedule for the group-dot kernel: pairs (i, j) with
    i + j <= max_pair, sorted by group k = i + j so every output group is
    visited in one consecutive grid run (the VMEM accumulator then never
    leaves the chip between pairs of a group)."""
    # every group k <= max_pair must own at least one pair, else its
    # output/scratch plane would flow downstream uninitialized (the XLA
    # pairwise form fails loudly on the same misuse)
    assert max_pair <= Sa + Sb - 2, (max_pair, Sa, Sb)
    ia, jb, grp, first = [], [], [], []
    for k in range(max_pair + 1):
        i0, i1 = max(0, k - (Sb - 1)), min(k, Sa - 1)
        for t, i in enumerate(range(i0, i1 + 1)):
            ia.append(i)
            jb.append(k - i)
            grp.append(k)
            first.append(1 if t == 0 else 0)
    return (np.asarray(ia, np.int32), np.asarray(jb, np.int32),
            np.asarray(grp, np.int32), np.asarray(first, np.int32))


def _group_dot_kernel(ia_ref, jb_ref, grp_ref, first_ref,
                      a_ref, b_ref, out_ref):
    """One grid step: add a (tm, tk) x (tk, tn) int8 pair-dot tile into
    the group's int32 output block.  The output block IS the accumulator
    (int32 in, int32 out — no scratch): pallas keeps it in VMEM while
    consecutive grid steps map to the same block, which the group-sorted
    pair schedule guarantees."""
    from jax.experimental import pallas as pl
    p = pl.program_id(2)
    kk = pl.program_id(3)

    @pl.when((kk == 0) & (first_ref[p] == 1))
    def _():
        out_ref[0, :, :] = jnp.zeros((out_ref.shape[1], out_ref.shape[2]),
                                     jnp.int32)

    out_ref[0, :, :] += jax.lax.dot_general(
        a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def pair_group_dots_pallas(a_stack, b_stack, max_pair):
    """Fused :func:`_pair_groups`: every slice product a_i @ b_j with
    i + j <= max_pair, summed into int32 groups by k = i + j, with the
    group accumulation living in VMEM instead of HBM.

    The XLA pairwise form writes each of the 21/36 int32 pair products
    (64 MB at N=4096) to HBM and reads them back for the group adds —
    ~2/3 of the measured stage cost is that traffic (PERFORMANCE.md,
    ozaki component profile).  Here the pair loop is a grid dimension
    whose schedule is sorted by group (static scalar-prefetch arrays
    drive the slice/group block indexing), so each group's output block
    is revisited consecutively and written back exactly once.

    Returns the groups as one [n_groups, M, N] int32 array (the callers'
    Horner/renorm chains index it like the former list)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .pallas_kernels import _interpret, _tile

    Sa, M, K = a_stack.shape
    Sb, K2, N = b_stack.shape
    assert K == K2
    ia, jb, grp, first = _pair_plan(Sa, Sb, max_pair)
    n_groups = max_pair + 1
    tm, tn, tk = _tile(M, 512), _tile(N, 512), _tile(K, 512)
    nk = K // tk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(M // tm, N // tn, len(ia), nk),
        in_specs=[
            pl.BlockSpec((1, tm, tk),
                         lambda mi, mj, p, kk, ia, jb, grp, first:
                         (ia[p], mi, kk)),
            pl.BlockSpec((1, tk, tn),
                         lambda mi, mj, p, kk, ia, jb, grp, first:
                         (jb[p], kk, mj)),
        ],
        out_specs=pl.BlockSpec((1, tm, tn),
                               lambda mi, mj, p, kk, ia, jb, grp, first:
                               (grp[p], mi, mj)),
    )
    return pl.pallas_call(
        _group_dot_kernel,
        out_shape=jax.ShapeDtypeStruct((n_groups, M, N), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel',
                                 'arbitrary', 'arbitrary')),
        interpret=_interpret(),
    )(jnp.asarray(ia), jnp.asarray(jb), jnp.asarray(grp),
      jnp.asarray(first), a_stack, b_stack)


def _group_horner_kernel(nk, plan, n_groups, a_ref, b_ref, out_ref,
                         acc_ref):
    """Stage-2 fusion: every pair dot accumulates into its group's int32
    VMEM scratch plane; at the tile's last grid step the group ladder is
    recombined into a double-single (hi, lo) f32 pair — the same ~49-bit
    value class XLA's emulated-f64 Horner produces, without ever writing
    the int32 groups to HBM.

    Exactness: each int32 group splits as t + r with t = (g>>12)<<12
    (<= 19 significant bits) and r in [0, 4096) — both convert to f32
    exactly, and the 2^{-7(k+2)} weights are pure exponent shifts, so the
    16 ladder terms are EXACT f32 numbers; they are summed with
    branch-free 2Sum error compensation (the terms decay 128x per group,
    the compensated sum's error is O(2^-48) relative — the double-single
    representation floor)."""
    from jax.experimental import pallas as pl
    kk = pl.program_id(2)
    _pair_dots_into_scratch(plan, a_ref, b_ref, acc_ref, kk)

    @pl.when(kk == nk - 1)
    def _():
        hi = jnp.zeros_like(acc_ref[0], jnp.float32)
        lo = jnp.zeros_like(acc_ref[0], jnp.float32)
        for k in range(n_groups):
            gk = acc_ref[k]
            tw = jnp.int32(12)  # literals are i64 under jax_enable_x64
            t = jax.lax.shift_left(
                jax.lax.shift_right_arithmetic(gk, tw), tw)
            r = gk - t
            w = jnp.float32(2.0 ** (-7 * (k + 2)))
            for term in (t.astype(jnp.float32) * w,
                         r.astype(jnp.float32) * w):
                # branch-free 2Sum: exact error of hi + term into e
                s1 = hi + term
                bb = s1 - hi
                e = (hi - (s1 - bb)) + (term - bb)
                hi = s1
                lo = lo + e
        # renormalize once so |lo| <= ulp(hi)/2
        s1 = hi + lo
        out_ref[0] = s1
        out_ref[1] = lo - (s1 - hi)


def pair_group_horner_pallas(a_stack, b_stack, max_pair):
    """Fused stage-2: group pair dots AND the Horner recombination in one
    Pallas pass.  Returns (hi, lo) f32 fields with hi + lo ~= sum_k
    group_k * 2^{-7(k+2)} to ~2^-48 relative — the caller lifts the pair
    to f64 (exact adds) and applies the f64 scale.

    vs :func:`pair_group_dots_pallas` + :func:`_horner_f64`: the int32
    group planes (8 x 64 MB at N=4096) never touch HBM, and the
    emulated-f64 Horner chain disappears; the kernel writes two f32
    planes instead."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .pallas_kernels import _interpret, _tile

    a_stack = a_stack[:max_pair + 1]   # see pair_group_renorm_pallas
    b_stack = b_stack[:max_pair + 1]
    Sa, M, K = a_stack.shape
    Sb, K2, N = b_stack.shape
    assert K == K2
    plan = _pair_plan(Sa, Sb, max_pair)
    n_groups = max_pair + 1
    # the (n_groups, tm, tn) int32 scratch is the VMEM budget driver:
    # 8 * 256 * 512 * 4 = 4 MiB (+ whole-stack operand blocks + the
    # double-buffered (2, tm, tn) f32 output) ~ 9 MiB total
    tm, tn, tk = _tile(M, 256), _tile(N, 512), _tile(K, 256)
    nk = K // tk
    grid, in_specs = _fused_stage_specs(Sa, Sb, M, N, K, tm, tn, tk)

    kern = functools.partial(_group_horner_kernel, nk, plan, n_groups)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, M, N), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, tm, tn),
                               lambda mi, mj, kk: (jnp.int32(0), mi, mj),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_groups, tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=_interpret(),
    )(a_stack, b_stack)
    return out[0], out[1]


def _pair_dots_into_scratch(plan, a_ref, b_ref, acc_ref, kk):
    """Shared fused-stage body: at kk==0 every group's scratch plane is
    initialized by its first pair's dot, later pairs and later kk steps
    accumulate.  The pair plan is STATIC — the loop unrolls into 21/36
    MXU dots per grid step with every operand already in VMEM (the slice
    stacks ride in as whole-stack blocks, so each slice crosses HBM once
    per output tile, not once per pair)."""
    from jax.experimental import pallas as pl
    for i, j, g, first in zip(*plan):
        prod = jax.lax.dot_general(
            a_ref[int(i)], b_ref[int(j)], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        if first:
            @pl.when(kk == 0)
            def _(g=int(g), prod=prod):
                acc_ref[g] = prod

            @pl.when(kk != 0)
            def _(g=int(g), prod=prod):
                acc_ref[g] += prod
        else:
            acc_ref[int(g)] += prod


def _group_renorm_kernel(nk, plan, n_groups, n_out, q,
                         a_ref, b_ref, out_ref, acc_ref):
    """Stage-1 fusion: pair dots accumulate into per-group int32 VMEM
    scratch; at the tile's last grid step the carry-renormalization chain
    (:func:`_renorm_to_slices`, exact int32 shifts/masks) emits the int8
    slot stack directly — the stage-1 group planes never touch HBM."""
    from jax.experimental import pallas as pl
    kk = pl.program_id(2)
    _pair_dots_into_scratch(plan, a_ref, b_ref, acc_ref, kk)

    @pl.when(kk == nk - 1)
    def _():
        c64 = jnp.int32(64)
        c127 = jnp.int32(127)
        c7 = jnp.int32(7)
        carry = jnp.zeros_like(acc_ref[0])
        low_slot = n_groups + q
        for j in range(low_slot, -1, -1):
            k = j - q - 1
            if 0 <= k < n_groups:
                carry = carry + acc_ref[k]
            r = ((carry + c64) & c127) - c64
            if j < n_out:
                out_ref[j] = r.astype(jnp.int8)
            carry = jax.lax.shift_right_arithmetic(carry - r, c7)


def _fused_stage_specs(Sa, Sb, M, N, K, tm, tn, tk):
    """Whole-stack operand BlockSpecs + grid for the fused stage kernels.
    A rides in as its full [Sa, tm, tk] slice stack per tile (HBM cost:
    each slice once per output tile instead of once per pair — the
    per-pair grid form measured out at ~3.5x the operand traffic)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    grid = (M // tm, N // tn, K // tk)
    in_specs = [
        pl.BlockSpec((Sa, tm, tk),
                     lambda mi, mj, kk: (jnp.int32(0), mi, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Sb, tk, tn),
                     lambda mi, mj, kk: (jnp.int32(0), kk, mj),
                     memory_space=pltpu.VMEM),
    ]
    return grid, in_specs


def pair_group_renorm_pallas(a_stack, b_stack, max_pair,
                             n_out, shift: int = RENORM_SHIFT):
    """Fused stage-1: group pair dots AND the carry renormalization in
    one Pallas pass, emitting the [n_out, M, N] int8 slot stack in the
    :func:`_renorm_to_slices` convention (bit-identical — the renorm is
    exact integer arithmetic either way)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .pallas_kernels import _interpret, _tile

    assert shift % 7 == 0
    q = shift // 7
    # slices past index max_pair can never join a pair (i + j <= max_pair
    # with both >= 0) — trim them from the whole-stack blocks
    a_stack = a_stack[:max_pair + 1]
    b_stack = b_stack[:max_pair + 1]
    Sa, M, K = a_stack.shape
    Sb, K2, N = b_stack.shape
    assert K == K2
    plan = _pair_plan(Sa, Sb, max_pair)
    n_groups = max_pair + 1
    # the renorm loop writes slots j <= n_groups + q only; larger n_out
    # would leave uninitialized int8 planes (XLA zero-fills them instead)
    assert n_out <= n_groups + q + 1, (n_out, n_groups, q)
    # (tm, tn, tk) = (256, 512, 256): scratch 6*256*512*4 = 3 MiB +
    # whole-stack operand blocks + the int8 output block ~ 7 MiB total
    tm, tn, tk = _tile(M, 256), _tile(N, 512), _tile(K, 256)
    nk = K // tk
    grid, in_specs = _fused_stage_specs(Sa, Sb, M, N, K, tm, tn, tk)

    kern = functools.partial(_group_renorm_kernel, nk, plan,
                             n_groups, n_out, q)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_out, M, N), jnp.int8),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_out, tm, tn),
                               lambda mi, mj, kk: (jnp.int32(0), mi, mj),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_groups, tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=_interpret(),
    )(a_stack, b_stack)


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
                 fused_groups=False, pallas_groups=False,
                 pallas_fused=False):
    """M_row @ U @ M_col with both stages in int8/int32.

    Ms_row/Ms_col are [S,N,N] int8 slice stacks of the two constant
    matrices (same scale m_scale); U is the f64 field."""
    dtype = U.dtype
    q = RENORM_SHIFT // 7
    # the pair cutoffs bound which slice indices any dot ever consumes:
    # stage 1 reads field slices j <= STAGE1_PAIR (the matrix is always
    # operand i), stage 2 reads renormalized slots i <= STAGE2_PAIR —
    # emitting more is pure waste, so the chains stop there (the dropped
    # slices changed no dot; results are bit-identical)
    n_field = min(N_SLICES, STAGE1_PAIR + 1)
    Us, su = (slice_field_pallas(U, n_field) if pallas_slice
              else slice_field(U, n_field))
    # the 2^RENORM_SHIFT static headroom occupies the top q slots of the
    # renormalized stack, so slot resolution runs to 2^-7(N_SLICES+q)
    # in principle — but stage 2 only ever reads slots i <= STAGE2_PAIR
    # (its pair cutoff), so emission stops there
    n_slots = min(N_SLICES + q, STAGE2_PAIR + 1)
    if pallas_fused:
        t = pair_group_renorm_pallas(Ms_row, Us, STAGE1_PAIR, n_slots)
    else:
        if pallas_groups:
            g1 = pair_group_dots_pallas(Ms_row, Us, STAGE1_PAIR)
        elif fused_groups:
            g1 = _pair_groups_fused(Ms_row, Us, max_pair=STAGE1_PAIR)
        else:
            g1 = _pair_groups(Ms_row, Us, _dot_left, max_pair=STAGE1_PAIR)
        t = _renorm_to_slices(g1, n_slices=n_slots)
    if pallas_fused:
        # stage-2 dots + Horner in one kernel: (hi, lo) f32 pair lifted
        # to f64 with two exact converts and one add (the pair is
        # non-overlapping after the kernel's final renormalization)
        hi, lo = pair_group_horner_pallas(t, Ms_col, STAGE2_PAIR)
        z = hi.astype(dtype) + lo.astype(dtype)
    else:
        if pallas_groups:
            g2 = pair_group_dots_pallas(t, Ms_col, STAGE2_PAIR)
        elif fused_groups:
            g2 = _pair_groups_fused(t, Ms_col, max_pair=STAGE2_PAIR)
        else:
            g2 = _pair_groups(t, Ms_col, _dot_right, max_pair=STAGE2_PAIR)
        z = _horner_f64(g2, jnp.dtype(dtype).type)
    # total scale: (m_scale * su * 2^RENORM_SHIFT) from stage 1 * m_scale
    z = z * (su * jnp.asarray(
        m_scale * m_scale * 2.0 ** RENORM_SHIFT, dtype))
    # materialize: downstream consumers (the six stat reductions of the
    # step) must not re-fuse/duplicate the 10-group Horner chain
    return jax.lax.optimization_barrier(z)


def dct2_ozaki(U, Cs, CsT, m_scale, constrain=lambda x: x,
               pallas_slice=False, fused_groups=False,
               pallas_groups=False, pallas_fused=False):
    """Orthonormal 2-D DCT-II (C @ U @ C^T) via exact int8 passes.
    Matches :func:`chsimpy_tpu.ops.dct.dct2` to ~1e-15 relative.

    The field's mean rides around the int8 path analytically
    (dct2(ones) = N e00): subtracting it shrinks the slice scale by the
    DC/fluctuation ratio, recovering deep-bit precision (see the cutoff
    note above)."""
    U = constrain(U)
    N = U.shape[-1]
    m = jnp.mean(U)
    Y = _transform2d(U - m, Cs, CsT, m_scale, pallas_slice=pallas_slice,
                     fused_groups=fused_groups, pallas_groups=pallas_groups,
                     pallas_fused=pallas_fused)
    return Y.at[0, 0].add(m * N)


def idct2_ozaki(X, Cs, CsT, m_scale, constrain=lambda x: x,
                pallas_slice=False, fused_groups=False,
                pallas_groups=False, pallas_fused=False):
    """Orthonormal 2-D DCT-III (C^T @ X @ C), inverse of
    :func:`dct2_ozaki`.  The DC coefficient is split off analytically
    (idct2(e00) = ones/N) before slicing."""
    X = constrain(X)
    N = X.shape[-1]
    d = X[0, 0]
    u = _transform2d(X.at[0, 0].set(0.0), CsT, Cs, m_scale,
                     pallas_slice=pallas_slice, fused_groups=fused_groups,
                     pallas_groups=pallas_groups, pallas_fused=pallas_fused)
    return u + d / N
