"""2-D DCT-II / DCT-III as matrix multiplication — the TPU-native transform.

The reference runs ``scipy.fftpack.dctn/idctn(norm='ortho')`` on one CPU core
(``chsimpy/solver.py:159,201,208``).  On TPU the right primitive is the MXU:
the orthonormal DCT-II along an axis is a multiply by the (N, N) cosine
matrix C, so the 2-D transform is two matmuls

    dct2(U)  = C @ U @ C^T          idct2(X) = C^T @ X @ C

This is O(N^3) instead of O(N^2 log N), but at N<=8192 the MXU turns that
into microseconds-to-milliseconds, it is *exactly* as accurate as the
operands (important for the <=1e-10 energy-trace contract), and under pjit it
shards into the canonical distributed-DCT pattern automatically: local
row-transform, ICI collective for the contracted dimension, local
column-transform — XLA inserts the all-gather/reduce-scatter.

f64 mode targets bit-accuracy (CPU tests / validation); f32 mode uses
``Precision.HIGHEST`` (6-pass bf16 on the MXU, ~f32 accuracy) for speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _dct_matrix_np(N: int) -> np.ndarray:
    """Orthonormal DCT-II matrix, computed in float64:
    C[k, n] = s_k * cos(pi * (2n + 1) * k / (2N)),
    s_0 = sqrt(1/N), s_k = sqrt(2/N)."""
    k = np.arange(N, dtype=np.float64)[:, None]
    n = np.arange(N, dtype=np.float64)[None, :]
    C = np.cos(np.pi * (2.0 * n + 1.0) * k / (2.0 * N))
    C *= np.sqrt(2.0 / N)
    C[0, :] *= np.sqrt(0.5)
    return C


def dct_matrix(N: int, dtype=jnp.float64) -> jnp.ndarray:
    return jnp.asarray(_dct_matrix_np(N), dtype=dtype)


def _mm(a, b, precision):
    return jnp.matmul(a, b, precision=precision)


def dct2(U: jnp.ndarray, C: jnp.ndarray,
         precision=jax.lax.Precision.HIGHEST,
         constrain=lambda x: x) -> jnp.ndarray:
    """Orthonormal 2-D DCT-II (equals scipy ``dctn(U, norm='ortho')``).

    ``constrain`` pins the row-transform intermediate back onto the grid
    sharding so the distributed transform becomes: local row matmul ->
    ICI collective (inserted by XLA) -> local column matmul."""
    return _mm(constrain(_mm(C, U, precision)), C.T, precision)


def idct2(X: jnp.ndarray, C: jnp.ndarray,
          precision=jax.lax.Precision.HIGHEST,
          constrain=lambda x: x) -> jnp.ndarray:
    """Orthonormal 2-D DCT-III, the exact inverse of :func:`dct2`
    (equals scipy ``idctn(X, norm='ortho')``)."""
    return _mm(constrain(_mm(C.T, X, precision)), C, precision)


def idct2_banded(X: jnp.ndarray, C: jnp.ndarray, k0: int,
                 precision=jax.lax.Precision.HIGH,
                 band_precision=jax.lax.Precision.DEFAULT,
                 constrain=lambda x: x) -> jnp.ndarray:
    """Spectrally banded-precision inverse DCT (experimental, round 5).

    Both stages of C^T X C contract over a FREQUENCY index (stage 1 the
    row index k of X, stage 2 the column index l — untouched by stage
    1), so each splits exactly into a dominant low band [0, k0) and a
    tail [k0, N): the low band runs at ``precision`` (3-pass bf16 for
    the f32 route), the tail at ``band_precision`` (1-pass bf16).

    Why the tail tolerates 1 pass: the CH field's spectrum decays hard
    under the semi-implicit damping — measured mid-coarsening (N=512
    step 800) max|X[k >= N/4]| / max|X| = 1.6e-4, so the tail's 1-pass
    rounding (~2^-8 relative) contributes ~6e-7 of the dominant scale,
    inside the f32 route's E class.  Early SPINODAL steps have a flat
    noise spectrum instead — whether the trajectory stays in class is an
    empirical question; see PERFORMANCE.md round 5 for the measured
    verdict.  Cost: per stage 3(k0/N) + (1 - k0/N) bf16 passes — 1.5
    vs 3 at k0 = N/4."""
    T = (_mm(C.T[:, :k0], X[:k0, :], precision)
         + _mm(C.T[:, k0:], X[k0:, :], band_precision))
    T = constrain(T)
    return (_mm(T[:, :k0], C[:k0, :], precision)
            + _mm(T[:, k0:], C[k0:, :], band_precision))


# ----------------------------------------------------------------------
# FFT route: DCT-II/III via an N-point real FFT (Makhoul 1980).
#
# O(N^2 log N) instead of the matmul's O(N^3) — at N=4096 that is ~100x
# fewer FLOPs, traded against the TPU FFT's lower arithmetic efficiency
# vs the MXU.  Which wins is measured, not assumed: see
# benchmarks/dct_bench.py and PERFORMANCE.md.  The permutation trick:
#   v[n] = x[2n],  v[N-1-n] = x[2n+1]        (even-odd fold, no 2N pad)
#   X[k] = 2 * Re( e^{-i pi k / 2N} * FFT_N(v)[k] )
# with orthonormal scaling s_0 = sqrt(1/4N), s_k = sqrt(1/2N).
# ----------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _dct_fft_twiddles_np(N: int):
    """(forward twiddle t, inverse twiddle ti) for the Makhoul method,
    computed in float64.  Forward: X_ortho[k] = Re(t[k] * V[k]) with
    t[k] = 2 s_k e^{-i pi k/2N}.  Inverse: V[k] = ti[k] * (Xu[k] -
    i Xu[N-k]) built on the unnormalized Xu = X_ortho / s_k."""
    k = np.arange(N, dtype=np.float64)
    s = np.full(N, np.sqrt(1.0 / (2.0 * N)))
    s[0] = np.sqrt(1.0 / (4.0 * N))
    w = np.exp(-1j * np.pi * k / (2.0 * N))
    t = 2.0 * s * w
    kh = np.arange(N // 2 + 1, dtype=np.float64)
    ti = 0.5 * np.exp(1j * np.pi * kh / (2.0 * N))
    # fold the ortho->unnormalized rescale (1/s_k) into the inverse
    sh = np.full(N // 2 + 1, np.sqrt(2.0 * N))
    sh[0] = np.sqrt(4.0 * N)
    return t, ti, sh


def _ctype(dtype):
    return jnp.complex128 if jnp.dtype(dtype) == jnp.float64 \
        else jnp.complex64


def dct1d_fft(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal DCT-II along the last axis via one N-point rFFT.
    Even N only (the even-odd fold assumes it); the resolver falls back
    to the matmul route for odd N."""
    N = x.shape[-1]
    if N % 2:
        raise ValueError(f"fft DCT route requires even N, got {N}")
    t, _, _ = _dct_fft_twiddles_np(N)
    th = jnp.asarray(t[:N // 2 + 1], _ctype(x.dtype))
    v = jnp.concatenate([x[..., ::2], x[..., 1::2][..., ::-1]], axis=-1)
    Vh = jnp.fft.rfft(v, axis=-1)                  # k = 0 .. N/2
    Xh = jnp.real(th * Vh)                          # k = 0 .. N/2
    # k > N/2 from Hermitian symmetry: X[k] = Re(t[k] conj(V[N-k]))
    tt = jnp.asarray(t[N // 2 + 1:], _ctype(x.dtype))
    Xt = jnp.real(tt * jnp.conj(Vh[..., 1:N // 2][..., ::-1]))
    return jnp.concatenate([Xh, Xt], axis=-1).astype(x.dtype)


def idct1d_fft(X: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal DCT-III (inverse of :func:`dct1d_fft`) along the last
    axis via one N-point irFFT.  Even N only."""
    N = X.shape[-1]
    if N % 2:
        raise ValueError(f"fft DCT route requires even N, got {N}")
    _, ti, sh = _dct_fft_twiddles_np(N)
    ct = _ctype(X.dtype)
    ti = jnp.asarray(ti * sh, ct)  # combined unnormalize + twiddle
    # Xu[k] - i*Xu[N-k] for k = 0..N/2 (Xu[N] == 0): the mirror term walks
    # the upper half downward, b[k] = Xu[N-k] = [0, Xu[N-1], .., Xu[N/2]]
    a = X[..., :N // 2 + 1]
    b = jnp.concatenate([jnp.zeros_like(X[..., :1]),
                         X[..., N // 2:][..., ::-1]], axis=-1)
    Vh = ti * (a - 1j * b.astype(ct))
    v = jnp.fft.irfft(Vh, n=N, axis=-1).astype(X.dtype)
    half = v[..., :N // 2]
    rev = v[..., N // 2:][..., ::-1]
    return jnp.stack([half, rev], axis=-1).reshape(X.shape)


# ----------------------------------------------------------------------
# Split (folded) matmul route: decimation-in-frequency on the MXU.
#
# The DCT-II matrix C has cosine symmetry: even output rows are symmetric
# in n (C[2m, n] == C[2m, N-1-n]), odd rows antisymmetric.  Folding the
# input, u = x + reverse(x), v = x - reverse(x) (first halves), gives
#     X[2m]   = A @ u,   A = C[0::2, :N/2]
#     X[2m+1] = B @ v,   B = C[1::2, :N/2]
# — two (N/2, N/2) matmuls instead of one (N, N): HALF the MXU FLOPs for
# two cheap VPU folds.  A is itself a scaled DCT-II(N/2) with the same
# symmetry, so the even branch folds again (levels=2: 3/8 of the FLOPs);
# B lacks the symmetry (its fold is sine-type), so recursion stops there.
# Inverse: the exact transpose, X_e/X_o de-interleave -> A^T/B^T matmuls
# -> unfold x = [(u+v)/2 ; reverse(u-v)/2].
# ----------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _split_tree_np(N: int, levels: int):
    """Nested block tree for `levels` folds: a leaf is a plain matrix, a
    node is (even_subtree, B).  Blocks are exact sub-matrices of the f64
    orthonormal DCT-II matrix; block rows have norm 1/sqrt(2) per level,
    which makes the structured transpose the exact inverse (no rescale)."""
    C = _dct_matrix_np(N)

    def rec(M, lv):
        n = M.shape[1]
        if lv == 0 or n % 2:
            return M
        return (rec(M[0::2, :n // 2], lv - 1), M[1::2, :n // 2])

    return rec(C, levels)


def _tree_to_device(t, dtype):
    if isinstance(t, tuple):
        return (_tree_to_device(t[0], dtype), _tree_to_device(t[1], dtype))
    if isinstance(t, dict):
        return {'d': jnp.asarray(t['d'], dtype),
                'tree': _tree_to_device(t['tree'], dtype),
                'r': jnp.asarray(t['r'], dtype)}
    return jnp.asarray(t, dtype)


def split_tree(N: int, levels: int, dtype=jnp.float64):
    """Device block tree (pass as an argument, never a closure constant)."""
    return _tree_to_device(_split_tree_np(N, levels), dtype)


def _hou_spec_np(B: np.ndarray) -> dict:
    """Hou spec {'d', 'tree', 'r'} for a dense odd block B, validating
    the scaled-DCT-IV form B[m, j] = alpha cos(pi(2j+1)(2m+1)/(4M))."""
    M = B.shape[0]
    j = np.arange(M, dtype=np.float64)
    alpha = B[0, 0] / np.cos(np.pi / (4.0 * M))
    ref = alpha * np.cos(np.pi * (2.0 * j[None, :] + 1.0)
                         * (2.0 * j[:, None] + 1.0) / (4.0 * M))
    if not np.allclose(B, ref, atol=1e-12):
        raise ValueError("odd block is not a scaled DCT-IV; cannot Hou it")
    d = 2.0 * np.cos(np.pi * (2.0 * j + 1.0) / (4.0 * M))
    s = np.full(M, np.sqrt(2.0 / M))
    s[0] = np.sqrt(1.0 / M)
    r = alpha / s
    r[0] *= 0.5
    return d, r


def _hou_inner_levels(M: int) -> int:
    """Fold depth for the Hou inner DCT-II of size M (the measured
    fold-depth table, PERFORMANCE.md)."""
    if M >= 4096 and M % 16 == 0:
        return 4
    if M >= 2048 and M % 8 == 0:
        return 3
    if M % 4 == 0:
        return 2
    return 1 if M % 2 == 0 else 0


@functools.lru_cache(maxsize=64)
def _hou_tree_np(N: int, levels: int, hou_min: int):
    """Split tree whose odd blocks of size >= hou_min are Hou specs
    (dense matrix replaced by diag-scale -> inner half-size DCT-II ->
    row-scale -> alternating cumsum; see the Hou block comment).  The
    inner DCT-II trees recurse through this same builder, so nested odd
    blocks above the threshold are Hou'd too."""
    C = _dct_matrix_np(N)

    def rec(Mtx, lv):
        n = Mtx.shape[1]
        if lv == 0 or n % 2:
            return Mtx
        even = rec(Mtx[0::2, :n // 2], lv - 1)
        B = Mtx[1::2, :n // 2]
        M = B.shape[0]
        if M >= hou_min and M % 2 == 0:
            d, r = _hou_spec_np(B)
            inner = _hou_tree_np(M, _hou_inner_levels(M), hou_min)
            return (even, {'d': d, 'tree': inner, 'r': r})
        return (even, B)

    return rec(C, levels)


def hou_tree(N: int, levels: int, dtype=jnp.float64, hou_min: int = 2048):
    """Device tree for the Hou-recursion split route — a drop-in
    replacement for :func:`split_tree` (same block order, same apply
    functions; odd blocks >= hou_min run the cumsum pipeline)."""
    return _tree_to_device(_hou_tree_np(N, levels, hou_min), dtype)


# --- Hou odd-branch recursion -----------------------------------------
#
# Every odd block of the split tree is a scaled DCT-IV:
#     B[m, j] = alpha * cos(pi (2j+1)(2m+1) / (4M)),   alpha = sqrt(2/N)
# (top level: rows C[1::2] of the N-point orthonormal matrix; the form is
# invariant under the even-branch recursion).  Hou's recursion (1987)
# reduces it to a HALF-COST pipeline instead of a dense (M, M) matmul:
#     u    = 2 cos(theta_j) * v          theta_j = pi(2j+1)/(4M)
#     Y    = DCT-II_M(u)                  (recursively foldable!)
#     z[m] = Y[m] * r[m]                  r folds 1/s_m, the m=0 half,
#                                         and alpha into one row scale
#     O[m] = z[m] - O[m-1]  ==  (-1)^m cumsum_m((-1)^m z[m])
# The alternating cumsum measured 0.17 ms vs the 0.64 ms (2048,2048)@
# (2048,4096) HIGH matmul it replaces on the v5e chip (round-4 probe), so
# the recursion wins wherever the inner DCT's folded cost + the cumsum is
# below the dense block.  An odd "spec" in a tree is therefore EITHER a
# dense matrix or a dict {'d': dscale (M,), 'tree': inner DCT-II tree,
# 'r': rscale (M,)}; every apply function below handles both, so the
# permuted / folded / pencil route variants inherit the recursion
# unchanged (the odd outputs stay in natural order within their block).


def _alt_cumsum(z, axis):
    """O[m] = sum_{k<=m} (-1)^(m-k) z[k] along ``axis``."""
    n = z.shape[axis]
    shape = [1] * z.ndim
    shape[axis] = n
    signs = jnp.asarray((-1.0) ** np.arange(n), z.dtype).reshape(shape)
    return signs * jnp.cumsum(signs * z, axis=axis)


def _alt_cumsum_rev(y, axis):
    """Transpose of :func:`_alt_cumsum`:
    (T^T y)[m] = (-1)^m sum_{k>=m} (-1)^k y[k]."""
    n = y.shape[axis]
    shape = [1] * y.ndim
    shape[axis] = n
    signs = jnp.asarray((-1.0) ** np.arange(n), y.dtype).reshape(shape)
    rev = (slice(None),) * axis + (slice(None, None, -1),)
    return signs * (jnp.cumsum((signs * y)[rev], axis=axis))[rev]


def _hou_col(spec, v, precision):
    """Odd-spec application contracting axis 0 (column stage)."""
    u = spec['d'][:, None] * v
    Y = _apply_split(spec['tree'], u, precision)
    return _alt_cumsum(spec['r'][:, None] * Y, axis=0)


def _hou_col_t(spec, y, precision):
    """Transpose of :func:`_hou_col` (inverse column stage)."""
    w = spec['r'][:, None] * _alt_cumsum_rev(y, axis=0)
    return spec['d'][:, None] * _apply_split_t(spec['tree'], w, precision)


def _hou_row(spec, v, precision):
    """Odd-spec application contracting the LAST axis (row stage)."""
    u = spec['d'][None, :] * v
    Y = _apply_split_right(spec['tree'], u, precision)
    return _alt_cumsum(spec['r'][None, :] * Y, axis=v.ndim - 1)


def _hou_row_t(spec, y, precision):
    """Transpose of :func:`_hou_row`."""
    w = spec['r'][None, :] * _alt_cumsum_rev(y, axis=y.ndim - 1)
    return spec['d'][None, :] * _apply_split_t_right(spec['tree'], w,
                                                     precision)


def _apply_split(tree, x, precision):
    """C_block @ x, contracting over axis 0 (x: (n, M))."""
    if not isinstance(tree, tuple):
        return jnp.matmul(tree, x, precision=precision)
    n = x.shape[0]
    top, bot = x[:n // 2], x[n // 2:][::-1]
    even = _apply_split(tree[0], top + bot, precision)
    v = top - bot
    odd = (_hou_col(tree[1], v, precision) if isinstance(tree[1], dict)
           else jnp.matmul(tree[1], v, precision=precision))
    # interleave rows [e0, o0, e1, o1, ...]
    return jnp.stack([even, odd], axis=1).reshape(n, x.shape[1])


def _apply_split_t(tree, y, precision):
    """C_block^T @ y (the exact inverse of :func:`_apply_split`)."""
    if not isinstance(tree, tuple):
        return jnp.matmul(tree.T, y, precision=precision)
    u = _apply_split_t(tree[0], y[0::2], precision)
    yo = y[1::2]
    v = (_hou_col_t(tree[1], yo, precision) if isinstance(tree[1], dict)
         else jnp.matmul(tree[1].T, yo, precision=precision))
    return jnp.concatenate([u + v, (u - v)[::-1]], axis=0)


def _apply_split_right(tree, x, precision):
    """x @ C_block^T, contracting the LAST axis, NATURAL (interleaved)
    output order — the row-stage twin of :func:`_apply_split` (used by
    the Hou inner transforms, which need natural order for the cumsum)."""
    if not isinstance(tree, tuple):
        return _mm_nt(x, tree, precision)
    n = x.shape[-1]
    top, bot = x[..., :n // 2], x[..., n // 2:][..., ::-1]
    even = _apply_split_right(tree[0], top + bot, precision)
    v = top - bot
    odd = (_hou_row(tree[1], v, precision) if isinstance(tree[1], dict)
           else _mm_nt(v, tree[1], precision))
    return jnp.stack([even, odd], axis=-1).reshape(
        x.shape[:-1] + (n,))


def _apply_split_t_right(tree, y, precision):
    """y @ C_block, last axis, natural input order — transpose of
    :func:`_apply_split_right`."""
    if not isinstance(tree, tuple):
        return jnp.matmul(y, tree, precision=precision)
    u = _apply_split_t_right(tree[0], y[..., 0::2], precision)
    yo = y[..., 1::2]
    v = (_hou_row_t(tree[1], yo, precision) if isinstance(tree[1], dict)
         else jnp.matmul(yo, tree[1], precision=precision))
    return jnp.concatenate([u + v, (u - v)[..., ::-1]], axis=-1)


def dct2_split(U, tree, precision=jax.lax.Precision.HIGHEST,
               constrain=lambda x: x):
    """Orthonormal 2-D DCT-II via the folded-matmul blocks (half the MXU
    FLOPs per fold level vs :func:`dct2`)."""
    X = _apply_split(tree, U, precision)
    return _apply_split(tree, constrain(X).T, precision).T


# --- permuted-basis variant: the CH stepper only ever touches spectral
# space ELEMENTWISE ((hat_U + Seig*hat_E)/CHeig), so the interleave that
# restores natural coefficient order inside _apply_split is pure waste in
# the hot loop — a full-array relayout per transform pass.  These
# variants leave outputs in block order [even-branch..., odd]; the
# eigenvalue grids are conjugated by the same permutation once at setup
# (split_permutation), making the permuted pipeline exactly equivalent.


def _apply_split_perm(tree, x, precision):
    """P · C_block @ x — like :func:`_apply_split` without the final
    interleave (outputs in recursive even/odd block order)."""
    if not isinstance(tree, tuple):
        return jnp.matmul(tree, x, precision=precision)
    n = x.shape[0]
    top, bot = x[:n // 2], x[n // 2:][::-1]
    even = _apply_split_perm(tree[0], top + bot, precision)
    v = top - bot
    odd = (_hou_col(tree[1], v, precision) if isinstance(tree[1], dict)
           else jnp.matmul(tree[1], v, precision=precision))
    return jnp.concatenate([even, odd], axis=0)


def _mmt_banded_l(M, y, precision, band_frac,
                  band_precision=jax.lax.Precision.DEFAULT):
    """M.T @ y with the tail of y's rows contracted at ``band_precision``.

    Every split-tree block is internally ASCENDING-frequency ordered (the
    E-leaf holds k = 2^L j, an O_l block odd multiples of 2^(l-1)), so a
    uniform within-block fraction bands the whole permuted spectrum at
    the same global cutoff: rows past ``band_frac`` of each block carry
    the CH spectrum's decayed tail (~1e-4 of the dominant band mid-run —
    see :func:`idct2_banded`), whose 1-pass rounding stays inside the f32
    E class (measured, PERFORMANCE.md round 5)."""
    if not band_frac:
        return jnp.matmul(M.T, y, precision=precision)
    j0 = max(1, int(y.shape[0] * band_frac))
    if j0 >= y.shape[0]:
        return jnp.matmul(M.T, y, precision=precision)
    return (jnp.matmul(M.T[:, :j0], y[:j0], precision=precision)
            + jnp.matmul(M.T[:, j0:], y[j0:], precision=band_precision))


def _mm_banded_r(y, M, precision, band_frac,
                 band_precision=jax.lax.Precision.DEFAULT):
    """y @ M with the tail of y's columns contracted at
    ``band_precision`` (right-side mirror of :func:`_mmt_banded_l`)."""
    if not band_frac:
        return jnp.matmul(y, M, precision=precision)
    j0 = max(1, int(y.shape[-1] * band_frac))
    if j0 >= y.shape[-1]:
        return jnp.matmul(y, M, precision=precision)
    return (jnp.matmul(y[..., :j0], M[:j0], precision=precision)
            + jnp.matmul(y[..., j0:], M[j0:], precision=band_precision))


def _apply_split_t_perm(tree, y, precision, band_frac=None):
    """C_block^T · P^T @ y — inverse of :func:`_apply_split_perm`
    (consumes block order directly, no de-interleave gather)."""
    if not isinstance(tree, tuple):
        return _mmt_banded_l(tree, y, precision, band_frac)
    n2 = y.shape[0] // 2
    u = _apply_split_t_perm(tree[0], y[:n2], precision, band_frac)
    yo = y[n2:]
    v = (_hou_col_t(tree[1], yo, precision) if isinstance(tree[1], dict)
         else _mmt_banded_l(tree[1], yo, precision, band_frac))
    return jnp.concatenate([u + v, (u - v)[::-1]], axis=0)


@functools.lru_cache(maxsize=64)
def _split_permutation_np(N: int, levels: int) -> np.ndarray:
    """perm with (P·C x)[i] == (C x)[perm[i]] for the block order of
    :func:`_apply_split_perm`."""
    def rec(n, lv):
        if lv == 0 or n % 2:
            return np.arange(n)
        even = 2 * rec(n // 2, lv - 1)
        odd = 1 + 2 * np.arange(n // 2)
        return np.concatenate([even, odd])
    return rec(N, levels)


def split_permute_grid(G: np.ndarray, N: int, levels: int) -> np.ndarray:
    """Conjugate an (N, N) spectral-space grid into the permuted basis
    (host-side, setup-time)."""
    p = _split_permutation_np(N, levels)
    return np.asarray(G)[np.ix_(p, p)]


def split_permute_axis(v: np.ndarray, N: int, levels: int) -> np.ndarray:
    """Permute a 1-D spectral axis into the split block order — the
    separable factor of :func:`split_permute_grid` (``G[ix_(p, p)]``),
    for grids that are elementwise in ``e[i] + e[j]`` and get rebuilt
    on device from the axis (coeffs.get_coefficients_axis)."""
    return np.asarray(v)[_split_permutation_np(N, levels)]


def _mm_nt(x, m, precision):
    """x @ m^T without materializing the transpose: contract x's last axis
    with m's axis 1 via dot_general (XLA folds the layout into the MXU
    pass; an explicit ``m.T`` costs a relayout of the block)."""
    return jax.lax.dot_general(
        x, m, (((x.ndim - 1,), (1,)), ((), ())), precision=precision)


def _apply_split_perm_right(tree, x, precision):
    """x @ (P·C_block)^T — the column-axis twin of
    :func:`_apply_split_perm` (folds and block order along the LAST
    axis).  Lets the 2-D transform run rows-then-columns with no
    full-field transposes."""
    if not isinstance(tree, tuple):
        return _mm_nt(x, tree, precision)
    n = x.shape[-1]
    top, bot = x[..., :n // 2], x[..., n // 2:][..., ::-1]
    even = _apply_split_perm_right(tree[0], top + bot, precision)
    v = top - bot
    odd = (_hou_row(tree[1], v, precision) if isinstance(tree[1], dict)
           else _mm_nt(v, tree[1], precision))
    return jnp.concatenate([even, odd], axis=-1)


def _apply_split_t_perm_right(tree, y, precision, band_frac=None):
    """y @ (C_block^T · P^T)^T = y @ P·C_block — inverse of
    :func:`_apply_split_perm_right` along the last axis."""
    if not isinstance(tree, tuple):
        return _mm_banded_r(y, tree, precision, band_frac)
    n2 = y.shape[-1] // 2
    u = _apply_split_t_perm_right(tree[0], y[..., :n2], precision,
                                  band_frac)
    yo = y[..., n2:]
    v = (_hou_row_t(tree[1], yo, precision) if isinstance(tree[1], dict)
         else _mm_banded_r(yo, tree[1], precision, band_frac))
    return jnp.concatenate([u + v, (u - v)[..., ::-1]], axis=-1)


def dct2_split_perm(U, tree, precision=jax.lax.Precision.HIGHEST,
                    constrain=lambda x: x):
    """2-D DCT-II into the permuted spectral basis.  Rows via the left
    (axis-0) application, columns via the right (axis-1) application —
    no full-field transposes (two 67 MB relayouts saved per call at
    N=4096 vs the transpose-and-reapply form)."""
    X = _apply_split_perm(tree, U, precision)
    return _apply_split_perm_right(tree, constrain(X), precision)


def idct2_split_perm(X, tree, precision=jax.lax.Precision.HIGHEST,
                     constrain=lambda x: x, band_frac=None):
    """Inverse from the permuted spectral basis (exact inverse of
    :func:`dct2_split_perm`).  ``band_frac`` contracts the high-k tail
    of every block at 1-pass bf16 (see :func:`_mmt_banded_l`)."""
    U = _apply_split_t_perm(tree, X, precision, band_frac)
    return _apply_split_t_perm_right(tree, constrain(U), precision,
                                     band_frac)


# --- level-1 field-fold variants: the hot loop's only consumers of U are
# ELEMENTWISE (nonlinear term, jitter, permutation-invariant stats), so
# the spatial layout of U between an inverse and the next forward is
# free.  Keeping U level-1 folded — bottom rows and right columns stored
# pre-reversed — turns the inverse's final unfold reversal and the next
# forward's first fold reversal into plain concatenates: the four
# full-field level-1 reversal relayouts per step disappear (the
# PERFORMANCE.md "reversal pair around the nonlinear term" headroom,
# ~0.3 ms/rt estimated at N=4096).  fold1/unfold1 are involutions applied
# once at solve-entry/read-back boundaries; deeper fold levels keep their
# reversals (they act on half-size intermediates inside the transform).


def fold1(x: jnp.ndarray) -> jnp.ndarray:
    """Natural <-> level-1-folded spatial layout (involution): bottom
    half rows reversed, then right half columns reversed."""
    n, m = x.shape[0], x.shape[1]
    x = jnp.concatenate([x[:n // 2], x[n // 2:][::-1]], axis=0)
    return jnp.concatenate([x[..., :m // 2], x[..., m // 2:][..., ::-1]],
                           axis=-1)


unfold1 = fold1


def fold1_np(a: np.ndarray) -> np.ndarray:
    """Host-side :func:`fold1` over the LAST TWO axes (jitter slab
    batches fold once per chunk on the host instead of per step on
    device)."""
    n, m = a.shape[-2], a.shape[-1]
    a = np.concatenate([a[..., :n // 2, :], a[..., n // 2:, :][..., ::-1, :]],
                       axis=-2)
    return np.concatenate([a[..., :m // 2], a[..., m // 2:][..., ::-1]],
                          axis=-1)


def dct2_split_perm_folded(V, tree, precision=jax.lax.Precision.HIGHEST,
                           constrain=lambda x: x):
    """2-D DCT-II (permuted spectral basis) of a level-1-FOLDED field.
    Bit-identical to ``dct2_split_perm(unfold1(V))`` — the level-1 fold
    reads the pre-reversed halves directly instead of reversing."""
    if not isinstance(tree, tuple):
        raise ValueError("folded split variants need levels >= 1")
    n = V.shape[0]
    top, bot = V[:n // 2], V[n // 2:]
    even = _apply_split_perm(tree[0], top + bot, precision)
    v = top - bot
    odd = (_hou_col(tree[1], v, precision) if isinstance(tree[1], dict)
           else jnp.matmul(tree[1], v, precision=precision))
    X = constrain(jnp.concatenate([even, odd], axis=0))
    m = X.shape[-1]
    left, right = X[..., :m // 2], X[..., m // 2:]
    even = _apply_split_perm_right(tree[0], left + right, precision)
    v = left - right
    odd = (_hou_row(tree[1], v, precision) if isinstance(tree[1], dict)
           else _mm_nt(v, tree[1], precision))
    return jnp.concatenate([even, odd], axis=-1)


def idct2_split_perm_folded(X, tree, precision=jax.lax.Precision.HIGHEST,
                            constrain=lambda x: x, band_frac=None):
    """Inverse of :func:`dct2_split_perm_folded`, emitting the
    level-1-FOLDED field (bit-identical to
    ``fold1(idct2_split_perm(X))`` without the two reversals)."""
    if not isinstance(tree, tuple):
        raise ValueError("folded split variants need levels >= 1")
    n2 = X.shape[0] // 2
    u = _apply_split_t_perm(tree[0], X[:n2], precision, band_frac)
    yo = X[n2:]
    v = (_hou_col_t(tree[1], yo, precision) if isinstance(tree[1], dict)
         else _mmt_banded_l(tree[1], yo, precision, band_frac))
    U = constrain(jnp.concatenate([u + v, u - v], axis=0))
    m2 = U.shape[-1] // 2
    u = _apply_split_t_perm_right(tree[0], U[..., :m2], precision,
                                  band_frac)
    yo = U[..., m2:]
    v = (_hou_row_t(tree[1], yo, precision) if isinstance(tree[1], dict)
         else _mm_banded_r(yo, tree[1], precision, band_frac))
    return jnp.concatenate([u + v, u - v], axis=-1)


def idct2_split(X, tree, precision=jax.lax.Precision.HIGHEST,
                constrain=lambda x: x):
    """Orthonormal 2-D DCT-III, exact structured transpose of
    :func:`dct2_split`."""
    U = _apply_split_t(tree, X, precision)
    return _apply_split_t(tree, constrain(U).T, precision).T


# ----------------------------------------------------------------------
# Pencil (1-D) sharded variants: the distributed-spectral decomposition.
#
# Under the pencil layout (parallel/sharding.py) the field U is COLUMN
# sharded (axis 0 fully local per device) and the spectral image ROW
# sharded (axis 1 fully local).  Each 1-D stage of the separable 2-D
# transform then acts on a local axis — any route works per stage,
# including the folded split blocks — and the ONLY communication is the
# resharding between the stages: one transpose all-to-all per 2-D
# transform, moving (D-1)/D of one field shard per device.  This
# replaces the GSPMD-partitioned 2-D contraction of the grid layout,
# whose audited wire volume is 5-8x higher (SCALING_PREDICTED.json).
#
# The forward :func:`dct2_split_perm` / :func:`dct2` already run
# column-stage-then-row-stage, so they ARE pencil-ready when given the
# spectral resharding as ``constrain``; the inverses below swap the
# stage order (row stage first — local on the row-sharded spectral
# input) which the separable transform permits.  Note the swapped order
# nests the two 1-D summations the other way round, so the pencil
# inverse is not bit-identical to the single-device inverse — it is an
# equally exact DCT-III (f64 roundtrip error at the representation
# floor), and the SHARDED program is bit-identical to the same pencil
# program on one device (every matmul contracts a local axis).
# ----------------------------------------------------------------------


def idct2_pencil(X, C, precision=jax.lax.Precision.HIGHEST,
                 constrain=lambda x: x):
    """DCT-III with the row (last-axis) stage first: ``(X @ C) -> reshard
    -> C^T @ ·``.  ``constrain`` pins the mid intermediate to the FIELD
    (column) sharding — the transpose all-to-all."""
    return _mm(C.T, constrain(_mm(X, C, precision)), precision)


def idct2_split_perm_pencil(X, tree, precision=jax.lax.Precision.HIGHEST,
                            constrain=lambda x: x, band_frac=None):
    """Inverse of :func:`dct2_split_perm` with the last-axis stage first
    (pencil stage order; see the block comment above)."""
    U = _apply_split_t_perm_right(tree, X, precision, band_frac)
    return _apply_split_t_perm(tree, constrain(U), precision, band_frac)


def dct2_fft(U: jnp.ndarray, constrain=lambda x: x) -> jnp.ndarray:
    """Orthonormal 2-D DCT-II via row/column rFFTs (axis -1 then axis 0)."""
    X = dct1d_fft(U)
    X = constrain(X)
    return dct1d_fft(X.T).T


def idct2_fft(X: jnp.ndarray, constrain=lambda x: x) -> jnp.ndarray:
    """Orthonormal 2-D DCT-III, exact inverse of :func:`dct2_fft`."""
    U = idct1d_fft(X)
    U = constrain(U)
    return idct1d_fft(U.T).T
