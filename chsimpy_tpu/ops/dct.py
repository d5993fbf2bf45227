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
