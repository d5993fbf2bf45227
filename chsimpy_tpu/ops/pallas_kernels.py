"""Pallas TPU kernels for the hot ops.

Three kernels back the float32 fast path when ``kernel_backend='pallas'``:

* :func:`chemical_potential` — the fused nonlinear term EnergieEut
  (one VMEM pass: log/divide/polynomial chain, reference
  ``chsimpy/solver.py:168-175``);
* :func:`spectral_update` — the fused eigenvalue-space update
  ``(hat_U + Seig*hatE) / CHeig`` (eq. 12 of Ghiass et al. 2016,
  reference ``solver.py:201-206``);
* :func:`matmul` — tiled MXU matmul with VMEM accumulator, used for the
  DCT applications ``C @ X`` / ``X @ C^T``.

All kernels are shape-tiled to the (8,128)-lane VPU / 128x128 MXU geometry
and run in interpreter mode on CPU for testing.  The XLA path remains the
default (XLA already fuses the elementwise chains; these kernels exist to
own the schedule where it matters and as the substrate for deeper fusion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU


def _interpret():
    return _INTERPRET or jax.default_backend() == 'cpu'


def _tile(N: int, want: int = 256) -> int:
    t = min(want, N)
    while N % t:
        t //= 2
    return max(t, 8 if N % 8 == 0 else 1)


# ----------------------------------------------------------------------
# fused chemical potential
# ----------------------------------------------------------------------

def _mu_kernel(RT, BRT, A0, A1, u_ref, out_ref):
    U = u_ref[:]
    Uinv = 1.0 - U
    U2inv = Uinv - U
    out_ref[:] = (RT * jnp.log(U / Uinv) - BRT
                  + (A0 + A1 * U2inv) * U2inv
                  - 2.0 * A1 * U * Uinv)


def chemical_potential(U, RT, BRT, A0, A1):
    """EnergieEut = RT·log(U/(1−U)) − BRT + (A0+A1(1−2U))(1−2U) − 2A1·U(1−U)."""
    N, M = U.shape
    tn, tm = _tile(N), _tile(M)
    kern = functools.partial(_mu_kernel, float(RT), float(BRT),
                             float(A0), float(A1))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(U.shape, U.dtype),
        grid=(N // tn, M // tm),
        in_specs=[pl.BlockSpec((tn, tm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(U)


# ----------------------------------------------------------------------
# fused spectral update
# ----------------------------------------------------------------------

def _update_kernel(hat_u_ref, hat_e_ref, seig_ref, cheig_ref, out_ref):
    out_ref[:] = ((hat_u_ref[:] + seig_ref[:] * hat_e_ref[:])
                  / cheig_ref[:])


def spectral_update(hat_U, hat_E, Seig, CHeig):
    """hat_U' = (hat_U + Seig * hat_E) / CHeig in one VMEM pass."""
    N, M = hat_U.shape
    tn, tm = _tile(N), _tile(M)
    spec = pl.BlockSpec((tn, tm), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _update_kernel,
        out_shape=jax.ShapeDtypeStruct(hat_U.shape, hat_U.dtype),
        grid=(N // tn, M // tm),
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(hat_U, hat_E, Seig, CHeig)


# ----------------------------------------------------------------------
# tiled MXU matmul (DCT application)
# ----------------------------------------------------------------------

def _matmul_kernel(nk, a_ref, b_ref, out_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def matmul(A, B, tile_m=256, tile_n=256, tile_k=512):
    """A @ B with f32 accumulation on the MXU (used for C @ X and X @ C^T
    of the DCT; operands are f32 in the fast path)."""
    M, K = A.shape
    K2, N = B.shape
    assert K == K2
    tm, tn, tk = _tile(M, tile_m), _tile(N, tile_n), _tile(K, tile_k)
    nk = K // tk
    kern = functools.partial(_matmul_kernel, nk)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), A.dtype),
        grid=(M // tm, N // tn, nk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=_interpret(),
    )(A, B)


def dct2_pallas(U, C):
    """2-D DCT-II via two tiled MXU matmuls."""
    return matmul(matmul(C, U), C.T)


def idct2_pallas(X, C):
    return matmul(matmul(C.T, X), C)
