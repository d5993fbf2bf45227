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


def supports_dtype(dtype) -> bool:
    """Whether the elementwise/stats kernels can run with this operand
    dtype.  Real TPU Mosaic has no float64 vector type — XLA's f64
    emulation happens above the kernel level — so f64 fields only pass
    through pallas kernels in interpret mode (CPU tests).  The ozaki
    slice kernel is exempt: it consumes pre-split f32 hi/lo components,
    never an f64 ref (ops/ozaki.py:slice_field_pallas)."""
    return jnp.dtype(dtype) != jnp.float64 or _interpret()


def _tile(N: int, want: int = 256) -> int:
    t = min(want, N)
    while N % t:
        t //= 2
    return max(t, 8 if N % 8 == 0 else 1)


def _whole(shape, memory_space):
    """Whole-array BlockSpec usable under any grid: explicit block shape +
    i32-zero index map.  A bare ``pl.BlockSpec(memory_space=...)`` under a
    grid makes pallas synthesize the zero index map with i64 literals when
    jax_enable_x64 is on, and the TPU Mosaic compiler rejects the mixed-
    width index tuple ("failed to legalize operation 'func.return'").
    The i32 literals must be built INSIDE the index map — pallas rejects
    captured tracer constants."""
    rank = len(shape)
    return pl.BlockSpec(shape, lambda *_: (jnp.int32(0),) * rank,
                        memory_space=memory_space)


# ----------------------------------------------------------------------
# fused chemical potential
# ----------------------------------------------------------------------

def _mu_kernel(RT, BRT, scal_ref, u_ref, out_ref):
    U = u_ref[:]
    A0 = scal_ref[0]
    A1 = scal_ref[1]
    Uinv = 1.0 - U
    U2inv = Uinv - U
    out_ref[:] = (RT * jnp.log(U / Uinv) - BRT
                  + (A0 + A1 * U2inv) * U2inv
                  - 2.0 * A1 * U * Uinv)


def chemical_potential(U, RT, BRT, A0, A1):
    """EnergieEut = RT·log(U/(1−U)) − BRT + (A0+A1(1−2U))(1−2U) − 2A1·U(1−U).

    A0/A1 are traced device scalars riding in SMEM (the UQ-perturbable
    pair — keeps the kernel reusable under the vmapped ensemble); RT/BRT
    are static floats shared by every member."""
    N, M = U.shape
    tn, tm = _tile(N), _tile(M)
    scal = jnp.stack([jnp.asarray(A0, U.dtype), jnp.asarray(A1, U.dtype)])
    kern = functools.partial(_mu_kernel, float(RT), float(BRT))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(U.shape, U.dtype),
        grid=(N // tn, M // tm),
        in_specs=[_whole((2,), pltpu.SMEM),
                  pl.BlockSpec((tn, tm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(scal, U)


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


# ----------------------------------------------------------------------
# fused field statistics (the measured Pallas win: the XLA stats chain
# costs ~1.7 ms at N=4096 f32 — ~25 HBM passes from materialized
# gradients and six separate reductions; this kernel computes every
# full-field sum in ONE banded pass over U and EnergieEut, with a 1-row
# halo DMA'd per band for the np.gradient stencil)
# ----------------------------------------------------------------------

def _pack_row(scalars, dtype):
    """(8, 128) tile with scalars[j] at [0, j], zeros elsewhere (built
    with masked selects — Mosaic has no scalar VMEM stores)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jnp.zeros((8, 128), dtype)
    for j, v in enumerate(scalars):
        row = jnp.where((sub == 0) & (lane == j), v.astype(dtype), row)
    return row


def _stats_band_kernel(N, tn, delx, RT, B, threshold,
                       scal_ref, up_ref, u_ref, dn_ref, eut_ref, out_ref):
    """Band partial sums accumulated into one (8, 128) tile:
    lane 0..4 of row 0 = [integrand, |grad U|^2, U, SA-count,
    EnergieEut^2].

    The three U inputs are pre-shifted views of the edge-padded field
    (rows r-1 / r / r+1), so the kernel needs no halo DMA — every operand
    is a plain banded block.  The grid is sequential ('arbitrary'): band b
    adds its partials onto the running tile.  Scalars (A0, A1 — the
    UQ-traced pair) ride in SMEM."""
    b = pl.program_id(0)
    A0 = scal_ref[0]
    A1 = scal_ref[1]
    U = u_ref[:]
    up = up_ref[:]                     # row r-1 (edge-replicated pad)
    dn = dn_ref[:]                     # row r+1

    # --- axis-0 gradient (rows) with np.gradient edge_order=1 semantics
    rows = jax.lax.broadcasted_iota(jnp.int32, (tn, N), 0) + b * tn
    central = (dn - up) / (2.0 * delx)
    fwd = (dn - U) / delx              # row 0: (U[1]-U[0])/h
    bwd = (U - up) / delx              # row N-1: (U[-1]-U[-2])/h
    dux = jnp.where(rows == 0, fwd,
                    jnp.where(rows == N - 1, bwd, central))

    # --- axis-1 gradient (columns) entirely within the band
    left = pltpu.roll(U, jnp.int32(1), axis=1)       # U[:, j-1]
    right = pltpu.roll(U, jnp.int32(N - 1), axis=1)  # U[:, j+1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tn, N), 1)
    centralc = (right - left) / (2.0 * delx)
    fwdc = (right - U) / delx
    bwdc = (U - left) / delx
    duy = jnp.where(cols == 0, fwdc,
                    jnp.where(cols == N - 1, bwdc, centralc))

    du2 = dux * dux + duy * duy

    Uinv = 1.0 - U
    integrand = (RT * (U * (jnp.log(U) - B) + Uinv * jnp.log(Uinv))
                 + (A0 + A1 * (Uinv - U)) * U * Uinv)

    E = eut_ref[:]
    row = _pack_row([jnp.sum(integrand), jnp.sum(du2), jnp.sum(U),
                     jnp.sum((U < threshold).astype(U.dtype)),
                     jnp.sum(E * E)], U.dtype)

    @pl.when(b == 0)
    def _():
        out_ref[:] = row

    @pl.when(b != 0)
    def _():
        out_ref[:] = out_ref[:] + row


def _absdev_band_kernel(tn, scal_ref, u_ref, out_ref):
    """Accumulated sum |U - mean| (PS pass 2; mean rides in SMEM)."""
    b = pl.program_id(0)
    row = _pack_row([jnp.sum(jnp.abs(u_ref[:] - scal_ref[0]))],
                    u_ref.dtype)

    @pl.when(b == 0)
    def _():
        out_ref[:] = row

    @pl.when(b != 0)
    def _():
        out_ref[:] = out_ref[:] + row


def _band_tile(N, width=None, n_ops=4, itemsize=4):
    """Band height for the stats kernels: 128 rows, shrunk until the
    ``n_ops`` double-buffered (tn, width) operand blocks fit the ~16 MiB
    scoped-VMEM limit (measured OOM at (128, 4096) x 4 f32 operands:
    16.28M > 16.00M)."""
    width = N if width is None else width
    tn = _tile(N, 128)
    while tn > 8 and tn * width * itemsize * n_ops * 2 > 12 * 2 ** 20:
        tn //= 2
    return tn


def stats_band_sums(U, EnergieEut, A0, A1, *, delx, RT, B, threshold):
    """(8, 128) tile of full-field sums via the fused kernel (lane 0..4 of
    row 0).  A0/A1 are traced device scalars (vmappable for the UQ
    ensemble)."""
    N = U.shape[0]
    tn = _band_tile(N, itemsize=U.dtype.itemsize)
    nb = N // tn
    scal = jnp.stack([jnp.asarray(A0, U.dtype),
                      jnp.asarray(A1, U.dtype)])
    # pre-shifted full-field views of the edge-padded field: the kernel
    # sees rows r-1 / r / r+1 as three plain banded operands (no halo DMA;
    # XLA materializes the shifted copies, ~3 HBM passes)
    up = jnp.concatenate([U[:1], U[:-1]], axis=0)
    dn = jnp.concatenate([U[1:], U[-1:]], axis=0)
    # NOTE index-map literals must be i32: under jax_enable_x64 a bare 0
    # becomes i64 and Mosaic rejects the mixed-width index tuple
    # ("failed to legalize operation 'func.return'")
    band = pl.BlockSpec((tn, N), lambda b: (b, jnp.int32(0)),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_stats_band_kernel, N, tn, float(delx),
                             float(RT), float(B), float(threshold))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), U.dtype),
        grid=(nb,),
        in_specs=[
            _whole((2,), pltpu.SMEM),
            band, band, band, band,
        ],
        out_specs=_whole((8, 128), pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=_interpret(),
    )(scal, up, U, dn, EnergieEut)


def fused_stats(U, EnergieEut, A0, A1, kappa_tilde, *,
                delx, RT, B, Amr, L, threshold):
    """Full _stats-equivalent via the fused kernels: returns
    (E, E2, PS, L2, Ra, SA) as f64 scalars (band partials combined in
    f64).  Ra (one mid row) stays in plain jnp — it is O(N)."""
    N = U.shape[0]
    sums = stats_band_sums(U, EnergieEut, A0, A1, delx=delx, RT=RT, B=B,
                           threshold=threshold)
    tot = sums[0].astype(jnp.float64)
    n2 = float(N * N)
    Lsq = L ** 2
    kt = jnp.asarray(kappa_tilde, jnp.float64)
    E2 = 0.5 * Amr * kt * Lsq * (tot[1] / n2)
    E = Amr * Lsq * (tot[0] / n2) + E2
    SA = tot[3] / n2
    L2 = jnp.sqrt(tot[4]) / n2
    meanU = tot[2] / n2
    ps = absdev_band_sums(U, meanU.astype(U.dtype))
    PS = ps[0, 0].astype(jnp.float64) / n2
    mid = U[N // 2 + 1, :]
    Ra = jnp.mean(jnp.abs(mid - jnp.mean(mid))).astype(jnp.float64)
    return E, E2, PS, L2, Ra, SA


def absdev_band_sums(U, mean):
    """(nbands, 8) partial sums of |U - mean| (PS second pass).  Handles
    non-square blocks (the sharded path feeds one shard's local block)."""
    N, W = U.shape
    tn = _band_tile(N, W, n_ops=1, itemsize=U.dtype.itemsize)
    nb = N // tn
    scal = jnp.asarray(mean, U.dtype).reshape(1)
    kern = functools.partial(_absdev_band_kernel, tn)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), U.dtype),
        grid=(nb,),
        in_specs=[
            _whole((1,), pltpu.SMEM),
            pl.BlockSpec((tn, W), lambda b: (b, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_whole((8, 128), pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=_interpret(),
    )(scal, U)


# ----------------------------------------------------------------------
# grid-sharded variants (shard_map + halo exchange): `--kernels pallas`
# composed with `--mesh`.  The banded stats kernel runs per shard on its
# local block; the np.gradient stencil's neighbor rows/columns arrive by
# ppermute along the mesh axes (edge-replicated at the global boundary),
# and the (8, 128) partial-sum tiles combine with one psum.  The
# reference has no analogue (single-process NumPy); the XLA path gets
# the same result from GSPMD auto-partitioning.
# ----------------------------------------------------------------------

def _stats_band_kernel_sh(N, tn, W, delx, RT, B, threshold,
                          ioff_ref, scal_ref, up_ref, u_ref, dn_ref,
                          lf_ref, rt_ref, eut_ref, out_ref):
    """Shard-local variant of :func:`_stats_band_kernel`: all four
    neighbor views (rows r-1/r+1, cols c-1/c+1) are pre-built operands
    (the halos crossed shard boundaries before the call), and the global
    row/col offsets of this shard ride in SMEM so the one-sided
    np.gradient edge stencil still keys on GLOBAL indices."""
    b = pl.program_id(0)
    row_off = ioff_ref[0]
    col_off = ioff_ref[1]
    A0 = scal_ref[0]
    A1 = scal_ref[1]
    U = u_ref[:]

    rows = (jax.lax.broadcasted_iota(jnp.int32, (tn, W), 0)
            + b * tn + row_off)
    up = up_ref[:]
    dn = dn_ref[:]
    central = (dn - up) / (2.0 * delx)
    fwd = (dn - U) / delx
    bwd = (U - up) / delx
    dux = jnp.where(rows == 0, fwd,
                    jnp.where(rows == N - 1, bwd, central))

    cols = jax.lax.broadcasted_iota(jnp.int32, (tn, W), 1) + col_off
    lf = lf_ref[:]
    rt = rt_ref[:]
    centralc = (rt - lf) / (2.0 * delx)
    fwdc = (rt - U) / delx
    bwdc = (U - lf) / delx
    duy = jnp.where(cols == 0, fwdc,
                    jnp.where(cols == N - 1, bwdc, centralc))

    du2 = dux * dux + duy * duy
    Uinv = 1.0 - U
    integrand = (RT * (U * (jnp.log(U) - B) + Uinv * jnp.log(Uinv))
                 + (A0 + A1 * (Uinv - U)) * U * Uinv)
    E = eut_ref[:]
    row = _pack_row([jnp.sum(integrand), jnp.sum(du2), jnp.sum(U),
                     jnp.sum((U < threshold).astype(U.dtype)),
                     jnp.sum(E * E)], U.dtype)

    @pl.when(b == 0)
    def _():
        out_ref[:] = row

    @pl.when(b != 0)
    def _():
        out_ref[:] = out_ref[:] + row


def _local_band_sums(N, Ub, up, dn, lf, rt, Eb, A0, A1, row_off, col_off,
                     *, delx, RT, B, threshold):
    """pallas_call wrapper for one shard's banded partial sums."""
    bn, W = Ub.shape
    tn = _band_tile(bn, W, n_ops=6, itemsize=Ub.dtype.itemsize)
    nb = bn // tn
    ioff = jnp.stack([jnp.asarray(row_off, jnp.int32),
                      jnp.asarray(col_off, jnp.int32)])
    scal = jnp.stack([jnp.asarray(A0, Ub.dtype),
                      jnp.asarray(A1, Ub.dtype)])
    band = pl.BlockSpec((tn, W), lambda b: (b, jnp.int32(0)),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_stats_band_kernel_sh, N, tn, W, float(delx),
                             float(RT), float(B), float(threshold))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), Ub.dtype),
        grid=(nb,),
        in_specs=[
            _whole((2,), pltpu.SMEM),
            _whole((2,), pltpu.SMEM),
            band, band, band, band, band, band,
        ],
        out_specs=_whole((8, 128), pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=_interpret(),
    )(ioff, scal, up, Ub, dn, lf, rt, Eb)


def _neighbor_views(Ub, axis_name, n_shards, axis):
    """(prev-shifted, next-shifted) views of the local block along
    ``axis``, with the boundary row/col fetched from the neighbor shard
    via ppermute (edge-replicated at the global boundary)."""
    idx = jax.lax.axis_index(axis_name)
    if axis == 0:
        last, first = Ub[-1:], Ub[:1]
    else:
        last, first = Ub[:, -1:], Ub[:, :1]
    # value of shard i-1's last row -> shard i (shard 0 receives zeros)
    prev_last = jax.lax.ppermute(
        last, axis_name, [(i, i + 1) for i in range(n_shards - 1)])
    next_first = jax.lax.ppermute(
        first, axis_name, [(i + 1, i) for i in range(n_shards - 1)])
    prev_last = jnp.where(idx == 0, first, prev_last)
    next_first = jnp.where(idx == n_shards - 1, last, next_first)
    if axis == 0:
        up = jnp.concatenate([prev_last, Ub[:-1]], axis=0)
        dn = jnp.concatenate([Ub[1:], next_first], axis=0)
    else:
        up = jnp.concatenate([prev_last, Ub[:, :-1]], axis=1)
        dn = jnp.concatenate([Ub[:, 1:], next_first], axis=1)
    return up, dn


def fused_stats_sharded(mesh, U, EnergieEut, A0, A1, kappa_tilde, *,
                        delx, RT, B, Amr, L, threshold):
    """Grid-sharded :func:`fused_stats`: one shard_map region — halo
    exchange (4 ppermutes of one edge row/col), per-shard banded kernel,
    psum of the partial tiles, f64 finalization (replicated out)."""
    N = U.shape[0]
    nx = mesh.shape['x']
    ny = mesh.shape['y']
    n2 = float(N * N)
    Lsq = L ** 2
    from jax.sharding import PartitionSpec as P

    def local(Ub, Eb, A0, A1, kt):
        bn, W = Ub.shape
        row_off = jax.lax.axis_index('x') * bn
        col_off = jax.lax.axis_index('y') * W
        up, dn = _neighbor_views(Ub, 'x', nx, 0)
        lf, rt = _neighbor_views(Ub, 'y', ny, 1)
        sums = _local_band_sums(N, Ub, up, dn, lf, rt, Eb, A0, A1,
                                row_off, col_off, delx=delx, RT=RT, B=B,
                                threshold=threshold)
        tot = jax.lax.psum(sums[0].astype(jnp.float64), ('x', 'y'))
        E2 = 0.5 * Amr * kt.astype(jnp.float64) * Lsq * (tot[1] / n2)
        E = Amr * Lsq * (tot[0] / n2) + E2
        SA = tot[3] / n2
        L2 = jnp.sqrt(tot[4]) / n2
        meanU = (tot[2] / n2).astype(Ub.dtype)
        ps = absdev_band_sums(Ub, meanU)
        PS = jax.lax.psum(ps[0, 0].astype(jnp.float64), ('x', 'y')) / n2
        # mid-row statistic: the owning x-shard contributes its segment
        rows = row_off + jnp.arange(bn)
        mask = (rows == N // 2 + 1).astype(Ub.dtype)[:, None]
        seg = jax.lax.psum(jnp.sum(Ub * mask, axis=0), 'x')   # (W,)
        mid_mean = jax.lax.psum(jnp.sum(seg), 'y') / N
        Ra = (jax.lax.psum(jnp.sum(jnp.abs(seg - mid_mean)), 'y')
              / N).astype(jnp.float64)
        return E, E2, PS, L2, Ra, SA

    # check_vma=False: pallas_call inside shard_map cannot declare its
    # output's varying-axes metadata (jax 0.9), so replication checking
    # is disabled for this region (the psums above make it replicated)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P('x', 'y'), P('x', 'y'), P(), P(), P()),
        out_specs=(P(),) * 6,
        check_vma=False)(U, EnergieEut, A0, A1,
                         jnp.asarray(kappa_tilde, jnp.float64))


def chemical_potential_sharded(mesh, U, RT, BRT, A0, A1):
    """Grid-sharded :func:`chemical_potential` (pointwise — plain
    shard_map, no halo)."""
    from jax.sharding import PartitionSpec as P

    def local(Ub, A0, A1):
        return chemical_potential(Ub, RT, BRT, A0, A1)

    return jax.shard_map(local, mesh=mesh,
                         in_specs=(P('x', 'y'), P(), P()),
                         out_specs=P('x', 'y'),
                         check_vma=False)(U, A0, A1)
