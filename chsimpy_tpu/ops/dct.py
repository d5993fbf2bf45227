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
    """Orthonormal DCT-II along the last axis via one N-point rFFT."""
    N = x.shape[-1]
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
    axis via one N-point irFFT."""
    N = X.shape[-1]
    _, ti, sh = _dct_fft_twiddles_np(N)
    ct = _ctype(X.dtype)
    ti = jnp.asarray(ti * sh, ct)  # combined unnormalize + twiddle
    # Xu[k] - i*Xu[N-k] for k = 0..N/2 (Xu[N] == 0)
    a = X[..., :N // 2 + 1]
    b = jnp.concatenate([jnp.zeros_like(X[..., :1]),
                         X[..., 1:N // 2 + 1][..., ::-1]], axis=-1)
    Vh = ti * (a - 1j * b.astype(ct))
    v = jnp.fft.irfft(Vh, n=N, axis=-1).astype(X.dtype)
    half = v[..., :N // 2]
    rev = v[..., N // 2:][..., ::-1]
    return jnp.stack([half, rev], axis=-1).reshape(X.shape)


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
