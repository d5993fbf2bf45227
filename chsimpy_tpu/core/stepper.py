"""The jitted Cahn-Hilliard time stepper.

TPU-native re-design of the reference hot loop (``chsimpy/solver.py:165-249``):
one pure step function — nonlinear chemical potential, optional adaptive-dt
coefficient rebuild, spectral semi-implicit update via matmul DCTs (MXU),
energy/stat reductions, timedata row write, early-stop predicate — driven by
an on-device ``lax.while_loop`` over a chunk of steps.  The host syncs one
scalar (stop_reason) per chunk instead of per step.

The per-member physics scalars (A0, A1, kappa_tilde) travel in ``consts`` as
*traced* device scalars, so the UQ ensemble driver can vmap the whole step
over a batch of perturbed coefficients (reference: one process per run,
``chsimpy/experiment.py:84-126``).  Everything else is static config baked
into the jaxpr.

Semantics preserved exactly, in order (reference line refs inline):
  * EnergieEut                         solver.py:168-175
  * adaptive delt + coeff rebuild      solver.py:177-193
  * time accumulation + time-limit     solver.py:195-199 (break BEFORE update)
  * spectral update + inverse DCT      solver.py:201-208
  * per-step jitter                    solver.py:210-211
  * energies and statistics            solver.py:213-228
  * timedata insert (it pre-increment) solver.py:231-239
  * energy-fall early stop             solver.py:242-249, timedata.py:51-63
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import coeffs as coeffs_ops
from ..ops import dct as dct_ops
from ..ops import ozaki as ozaki_ops
from ..ops.stencil import gradient2d
from .state import (STOP_ENERGY, STOP_NAN, STOP_NONE, STOP_TIME_LIMIT,
                    SolverState)

ADAPT_ALPHA = 500.0 / 2 ** 3  # solver.py:182


@dataclass(frozen=True)
class StepConfig:
    """Static (compile-time) configuration of the step function."""
    N: int
    dtype: str                  # 'float64' | 'float32'
    # physics scalars shared across ensemble members (baked into the jaxpr)
    RT: float
    BRT: float
    B: float
    Amr: float
    L: float
    delx: float
    delx2: float
    M_tilde: float
    threshold: float
    # per-run defaults for the traced scalars (single-run path)
    A0: float = 0.0
    A1: float = 0.0
    kappa_tilde: float = 0.0
    # stepping
    delt_base: float = 3e-8     # params.delt: lower bound in adaptive mode
    delt_max: float = 9e-8
    adaptive_time: bool = False
    time_limit: Optional[float] = None  # seconds of simulated time
    full_sim: bool = False
    # jitter
    jitter: Optional[float] = None
    # none | stream (host bit-exact) | static (simplex) | device (threefry,
    # NOT reference-exact) | device_sobol (on-device scrambled Sobol,
    # bit-exact with the scipy stream — ops/sobol.py)
    jitter_mode: str = 'none'
    # kernel dispatch: 'xla' (default; XLA fuses the elementwise chains) or
    # 'pallas' (hand-tiled kernels, float32 single-run path only)
    kernel_backend: str = 'xla'
    # DCT route (resolved, no 'auto' here; measured table in
    # PERFORMANCE.md): 'matmul' (MXU C·U·Cᵀ; shards under a mesh),
    # 'split' (folded-matmul decimation — ~1.5x the matmul at N>=1024 f32;
    # single-device/ensemble paths), 'fft' (Makhoul rFFT; loses to the MXU
    # on TPU, kept for CPU f64 and as a measured alternative), 'ozaki'
    # (float64 only: exact int8-slice MXU passes — the fast TPU f64
    # validation transform, see ops/ozaki.py)
    transform_backend: str = 'matmul'
    # fold depth of the 'split' route; None resolves by size (measured,
    # dct_bench f32 ms/roundtrip: N=4096 level3 5.40 / level4 4.74 /
    # level5 4.89; N=8192 37.4 / 35.8 / 35.8; N=2048 level2 1.03 /
    # level3 1.00; N=1024 level2 0.576 best — deeper folds lose to
    # small-block MXU inefficiency below those sizes)
    split_levels: Optional[int] = None
    # slice-wise restructured stat reductions (changes summation order vs
    # the reference, ~1e-15 relative — fine for the 1e-10 E contract).
    # Always on for f32; the solver enables it for f64 ONLY on TPU (the
    # CPU f64 path is the bit-level validation contract and keeps the
    # reference-order _stats)
    fast_stats: bool = False
    # level-1 folded field layout between inverse and forward transform
    # (split route only): the four level-1 reversal relayouts per step
    # disappear; stats regroup their slice sums (ULP-order trace
    # differences).  At EQUAL split depth the fold is pure data layout (U
    # trajectory bit-identical); note split_levels_resolved picks one more
    # fold level under fold_field at N>=4096 (measured faster there), so
    # default folded/natural trajectories differ at those sizes unless
    # split_levels is pinned.  Default where it composes since round 3
    # (+3.6% e2e measured; resolve_fold_field in core/solver.py decides)
    fold_field: bool = False
    # level-1 folded blocks for the ozaki int8 transform: half the int8
    # MACs per stage (measured 42.3 vs 48.5 ms/rt at N=4096 f64 on chip),
    # natural layout in/out.  Single-device only (the solver sets it when
    # transform == 'ozaki' and no grid mesh; sharded ozaki keeps the
    # GSPMD-partitioned unfolded dots)
    ozaki_fold: bool = False
    # recursive folded ozaki in the PERMUTED basis (round 4): MAC
    # fractions 1/2, 3/8, 11/32 at levels 1/2/3, no interleaves or
    # strided gathers; overrides ozaki_fold when > 0 (leig is conjugated
    # like the split route's).  Chip numbers in PERFORMANCE.md round 4;
    # int32 bounds gate levels <= 3 at N <= 4096, <= 2 at 8192
    # (ops/ozaki.py)
    ozaki_rfold_levels: int = 0
    # trimmed (stage1, stage2) pair cutoffs for the FORWARD ozaki
    # transform only (None = the contract-validated (5, 7) both ways);
    # the nonlinear term's spectral image rides the semi-implicit
    # damping, so the forward tolerates fewer passes — measured gates in
    # PERFORMANCE.md round 4.  The inverse always keeps (5, 7).
    ozaki_fwd_pairs: Optional[tuple] = None
    # INVERSE pair cutoffs (rfold route); None = untrimmed (5, 7).  The
    # trim is measured against the full f64 contract in its own right
    # (no damping shield): scripts/probes/ozaki_inv_trim.py +
    # resolve_ozaki_inv_pairs
    ozaki_inv_pairs: Optional[tuple] = None
    # pencil (1-D) sharded layout for the split route under a mesh: the
    # field is column-sharded over every device, the spectral image
    # row-sharded, each 1-D transform stage runs on a LOCAL axis, and the
    # only transform communication is one transpose all-to-all per 2-D
    # transform (parallel/sharding.py) — replacing the grid layout's
    # GSPMD-partitioned 2-D contraction at 5-8x the wire volume
    pencil: bool = False

    @property
    def split_levels_resolved(self) -> int:
        if self.split_levels is not None:
            return self.split_levels
        if self.N >= 4096 and self.N % 32 == 0 and self.fold_field:
            # under the folded field layout one more fold level pays:
            # splitXpermfold chip sweep (round 3) N=4096 lv4 4.44 /
            # lv5 4.23 ms/rt, N=8192 lv4 ~33.6 / lv5 31.7
            return 5
        if self.N >= 4096 and self.N % 16 == 0:
            return 4
        if self.N >= 2048 and self.N % 8 == 0:
            return 3
        return 2
    # MXU precision for the DCT matmuls in float32 mode: 'highest' (6-pass
    # bf16, ~f32 accuracy), 'high' (3-pass, ~2x faster), 'default' (1-pass
    # bf16 — too lossy for the spectral update; exposed for experiments)
    matmul_precision: str = 'highest'
    # MXU precision for the FORWARD transform (of the nonlinear term)
    # only; None = matmul_precision.  The forward's spectral image enters
    # the update scaled by Seig/CHeig — the semi-implicit damping — so it
    # tolerates fewer passes than the inverse, whose output IS the field
    # (sensitivity math + chip measurements in PERFORMANCE.md round 4)
    fwd_matmul_precision: Optional[str] = None
    # experimental banded-precision inverse (matmul route only): spectral
    # rows/cols >= inv_band contract at 1-pass bf16, the dominant low
    # band keeps mm_precision (ops/dct.py idct2_banded — measured
    # verdict in PERFORMANCE.md round 5)
    inv_band: Optional[int] = None
    # rebuild Seig/CHeig per step from the 1-D eigenvalue axis instead
    # of streaming two precomputed (N, N) grids — an HBM-bytes-for-VPU-
    # flops trade on the bandwidth-bound f32 step
    # (coeffs.get_coefficients_axis; resolver gate in core/solver.py)
    otf_coeffs: bool = False
    # PROBE-ONLY, MEASURED NEGATIVE (scripts/probes/spectral_bf16_probe
    # .py, PERFORMANCE.md round 5): bf16-stored spectral state.  The
    # hoped-for HBM halving of hat_U's 2F/step did not materialize
    # (286.5 vs 286.8 steps/s at N=4096) AND the carried-state rounding
    # compounds through the recurrence: N=2048 stop 2060 -> 2548
    # (+24.9%), E max rel 3.4e-6 -> 1.9e-5.  Kept as the measurement
    # apparatus; no CLI surface
    spectral_bf16: bool = False

    @property
    def mm_precision(self):
        return {'highest': jax.lax.Precision.HIGHEST,
                'high': jax.lax.Precision.HIGH,
                'default': jax.lax.Precision.DEFAULT}[self.matmul_precision]

    @property
    def fwd_mm_precision(self):
        key = self.fwd_matmul_precision or self.matmul_precision
        return {'highest': jax.lax.Precision.HIGHEST,
                'high': jax.lax.Precision.HIGH,
                'default': jax.lax.Precision.DEFAULT}[key]

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def make_consts(cfg: StepConfig, delt: float,
                A0: float = None, A1: float = None,
                kappa_tilde: float = None) -> dict:
    """Device-resident constants passed to the runner: DCT matrix,
    eigenvalue grid, update coefficient grids, and the traced physics
    scalars (A0, A1, kappa_tilde — the UQ-perturbable set)."""
    dtype = cfg.jdtype
    A0 = cfg.A0 if A0 is None else A0
    A1 = cfg.A1 if A1 is None else A1
    kt = cfg.kappa_tilde if kappa_tilde is None else kappa_tilde
    _z8 = jnp.zeros((0,), jnp.int8)
    fold_stacks = {k: _z8 for k in ('CeS', 'CoS', 'CeTS', 'CoTS')}
    rf = ()
    if cfg.transform_backend == 'ozaki':
        # int8 slice stacks of C / C^T instead of the f64 matrix (saves
        # the 8x-larger emulated-f64 upload; the route never touches C)
        C = jnp.zeros((0,), dtype)
        if cfg.ozaki_rfold_levels:
            Cs = CsT = _z8
            rf = ozaki_ops.dct_rfold_slices(cfg.N,
                                            cfg.ozaki_rfold_levels)[0]
        elif cfg.ozaki_fold:
            Cs = CsT = _z8
            fs = ozaki_ops.dct_fold_slices(cfg.N)
            fold_stacks = {k: fs[k] for k in fold_stacks}
        else:
            Cs, CsT, _ = ozaki_ops.dct_slices(cfg.N)
    else:
        C = dct_ops.dct_matrix(cfg.N, dtype)
        Cs = CsT = _z8
    leig = coeffs_ops.eigenvalues(cfg.N, dtype)
    if cfg.transform_backend == 'ozaki' and cfg.ozaki_rfold_levels:
        # the recursive folded route emits the split route's permuted
        # block order; conjugating leig keeps setup grids AND the
        # adaptive on-device rebuild consistent (same trick as 'split')
        leig = jnp.asarray(dct_ops.split_permute_grid(
            np.asarray(leig), cfg.N, cfg.ozaki_rfold_levels), dtype)
    if cfg.transform_backend == 'split':
        # the split route works in a PERMUTED spectral basis (block order
        # instead of interleaved — drops a relayout per transform pass in
        # the hot loop).  CHeig/Seig are elementwise in leig, so permuting
        # leig once here keeps both the setup grids and the adaptive-mode
        # on-device rebuild consistent automatically.
        leig = jnp.asarray(dct_ops.split_permute_grid(
            np.asarray(leig), cfg.N, cfg.split_levels_resolved), dtype)
        tree = dct_ops.split_tree(cfg.N, cfg.split_levels_resolved, dtype)
    else:
        tree = ()
    CHeig, Seig = coeffs_ops.get_coefficients(
        leig, jnp.asarray(kt, dtype), jnp.asarray(delt, dtype), cfg.delx2)
    # 1-D eigenvalue axis in the SAME basis order as leig (split/rfold
    # permute it): the otf_coeffs path rebuilds the coefficient grids
    # from this per step instead of reading them from HBM
    eaxis = coeffs_ops.eigenvalue_axis(cfg.N)
    if cfg.transform_backend == 'split':
        eaxis = dct_ops.split_permute_axis(eaxis, cfg.N,
                                           cfg.split_levels_resolved)
    elif cfg.transform_backend == 'ozaki' and cfg.ozaki_rfold_levels:
        eaxis = dct_ops.split_permute_axis(eaxis, cfg.N,
                                           cfg.ozaki_rfold_levels)
    _zu = jnp.zeros((0,), jnp.uint32)
    return {'C': C, 'Cs': Cs, 'CsT': CsT, 'leig': leig, 'tree': tree,
            'eaxis': jnp.asarray(eaxis, dtype),
            'CHeig': CHeig.astype(dtype), 'Seig': Seig.astype(dtype),
            'A0': jnp.asarray(A0, jnp.float64),
            'A1': jnp.asarray(A1, jnp.float64),
            'kappa_tilde': jnp.asarray(kt, jnp.float64),
            # device-sobol jitter tables (ops/sobol.py); the solver fills
            # them when jitter_mode == 'device_sobol'
            'sobol_sv': _zu, 'sobol_shift': _zu,
            'sobol_base': jnp.zeros((), jnp.uint32),
            'rf': rf,
            **fold_stacks}


CONSTS_BATCH_AXES = {'C': None, 'Cs': None, 'CsT': None, 'leig': None,
                     'tree': None, 'eaxis': None, 'CHeig': 0,
                     'Seig': None, 'A0': 0, 'A1': 0, 'kappa_tilde': 0,
                     'CeS': None, 'CoS': None, 'CeTS': None, 'CoTS': None,
                     'sobol_sv': None, 'sobol_shift': None,
                     'sobol_base': None, 'rf': None}


def _nonlinear_term(cfg: StepConfig, consts, U, mesh=None):
    """Shifted nonlinear chemical potential EnergieEut (solver.py:168-175)."""
    if cfg.kernel_backend == 'pallas':
        # traced per-member scalars ride into the kernel via SMEM (the
        # vmapped ensemble perturbs A0/A1 per member).  f64 fields on a
        # real TPU fall through to the XLA chain (pk.supports_dtype —
        # Mosaic has no f64 vector type); the ozaki slice kernel still
        # applies, it takes pre-split f32 components.
        from ..ops import pallas_kernels as pk
        if pk.supports_dtype(cfg.jdtype):
            if mesh is not None:
                return pk.chemical_potential_sharded(
                    mesh, U, cfg.RT, cfg.BRT, consts['A0'], consts['A1'])
            return pk.chemical_potential(U, cfg.RT, cfg.BRT,
                                         consts['A0'], consts['A1'])
    dtype = U.dtype
    A0 = consts['A0'].astype(dtype)
    A1 = consts['A1'].astype(dtype)
    Uinv = 1.0 - U
    U1Uinv = U / Uinv
    U2inv = Uinv - U
    return (cfg.RT * jnp.log(U1Uinv) - cfg.BRT
            + (A0 + A1 * U2inv) * U2inv
            - 2.0 * A1 * U * Uinv)


def _sum2_f64(x):
    """Two-stage reduction with an f64 outer accumulation: the inner f32
    row sums keep the HBM pass single-precision (free on the VPU), while
    the N-element outer sum runs in f64 — ~100x less rounding error than
    a flat f32 reduce for the cost of N (not N^2) emulated-f64 adds.
    The early-stop comparison E2[it-1] > E2[it] (timedata.py:51-63) flips
    on ~1e-7-relative noise near the stop step, so the f32 fast path
    needs this to reproduce the reference's exact stop step."""
    if x.ndim == 2:
        return jnp.sum(jnp.sum(x, axis=1).astype(jnp.float64))
    return jnp.sum(x.astype(jnp.float64))


def _grad_sq_sum(U, delx):
    """sum over the field of dux^2 + duy^2 (np.gradient edge_order=1
    semantics) WITHOUT materializing the gradient arrays: the central and
    one-sided contributions reduce slice-wise, so XLA fuses everything
    into shifted-load reduction loops instead of the concat+square+mean
    chain (measured 2-3x fewer HBM passes at N=4096).  Returns f64 (see
    _sum2_f64: the result drives the early-stop comparison)."""
    h = delx
    h2 = 2.0 * delx

    def sq_sum(x):
        return _sum2_f64(x * x)

    rows = (sq_sum((U[2:, :] - U[:-2, :]) / h2)
            + sq_sum((U[1, :] - U[0, :]) / h)
            + sq_sum((U[-1, :] - U[-2, :]) / h))
    cols = (sq_sum((U[:, 2:] - U[:, :-2]) / h2)
            + sq_sum((U[:, 1] - U[:, 0]) / h)
            + sq_sum((U[:, -1] - U[:, -2]) / h))
    return rows + cols


def _grad_sq_sum_folded(V, delx):
    """:func:`_grad_sq_sum` over a level-1-FOLDED field (ops/dct.py
    fold1: V[i<n/2] = U[i], V[n/2+j] = U[n-1-j], same on columns).
    Identical per-element gradient terms, regrouped into fold-aware
    slices — top/bottom interiors, the two seam rows/cols that straddle
    the fold, and the physical edges.  The regrouping shifts the sum by
    reduction-order ULPs only (squares are sign-blind, so the reversed
    half's negated differences are immaterial)."""
    h = delx
    h2 = 2.0 * delx

    def sq(x):
        return _sum2_f64(x * x)

    n = V.shape[0]
    half = n // 2
    rows = (sq((V[2:half] - V[:half - 2]) / h2)       # U rows 1..n/2-2
            + sq((V[n - 1] - V[half - 2]) / h2)       # U row n/2-1 (seam)
            + sq((V[n - 2] - V[half - 1]) / h2)       # U row n/2   (seam)
            + sq((V[half:-2] - V[half + 2:]) / h2)    # U rows n/2+1..n-2
            + sq((V[1] - V[0]) / h)                   # U edge row 0
            + sq((V[half] - V[half + 1]) / h))        # U edge row n-1
    m = V.shape[1]
    hc = m // 2
    cols = (sq((V[:, 2:hc] - V[:, :hc - 2]) / h2)
            + sq((V[:, m - 1] - V[:, hc - 2]) / h2)
            + sq((V[:, m - 2] - V[:, hc - 1]) / h2)
            + sq((V[:, hc:-2] - V[:, hc + 2:]) / h2)
            + sq((V[:, 1] - V[:, 0]) / h)
            + sq((V[:, hc] - V[:, hc + 1]) / h))
    return rows + cols


def _stats_fast(cfg: StepConfig, consts, U, EnergieEut):
    """Reduction-only statistics for the float32 fast path: every sum
    taken directly (no gradient/abs-deviation intermediates beyond what
    fuses); finalization in f64.  Summation order differs from _stats —
    float64 validation mode keeps the original form.

    Under ``cfg.fold_field`` U/EnergieEut arrive level-1 folded: every
    whole-array reduction is permutation-invariant; the gradient sum and
    the mid-row extraction use the fold-aware forms."""
    N = cfg.N
    dtype = U.dtype
    A0 = consts['A0'].astype(dtype)
    A1 = consts['A1'].astype(dtype)
    kt = consts['kappa_tilde'].astype(jnp.float64)
    n2 = float(N * N)
    Lsq = cfg.L ** 2
    Uinv = 1.0 - U
    integrand = (cfg.RT * (U * (jnp.log(U) - cfg.B) + Uinv * jnp.log(Uinv))
                 + (A0 + A1 * (Uinv - U)) * U * Uinv)
    # f64 outer accumulation (see _sum2_f64): stabilizes E/E2/L2 against
    # flat-f32 reduce noise — in particular the early-stop comparison
    s_int = _sum2_f64(integrand)
    s_du2 = (_grad_sq_sum_folded(U, cfg.delx) if cfg.fold_field
             else _grad_sq_sum(U, cfg.delx))
    s_u = jnp.sum(U).astype(jnp.float64)
    s_sa = jnp.sum((U < cfg.threshold).astype(dtype)).astype(jnp.float64)
    s_e2 = _sum2_f64(EnergieEut * EnergieEut)

    E2 = 0.5 * cfg.Amr * kt * Lsq * (s_du2 / n2)
    E = cfg.Amr * Lsq * (s_int / n2) + E2
    SA = s_sa / n2
    L2 = jnp.sqrt(s_e2) / n2
    meanU = (s_u / n2).astype(dtype)
    PS = jnp.sum(jnp.abs(U - meanU)).astype(jnp.float64) / n2
    # original row N/2+1 sits at folded row N-2 (j = N/2-2); Ra is
    # invariant to the column permutation within the row
    mid = U[N - 2, :] if cfg.fold_field else U[N // 2 + 1, :]
    Ra = jnp.mean(jnp.abs(mid - jnp.mean(mid))).astype(jnp.float64)
    return E, E2, PS, L2, Ra, SA


def _stats(cfg: StepConfig, consts, U, EnergieEut=None, mesh=None):
    """Energy functionals and field statistics (solver.py:213-228).
    Returns f64 scalars (row entries) regardless of field dtype.
    ``EnergieEut=None`` (prepare path) yields L2 = 0 without materializing a
    zeros array (a large HLO constant compiles pathologically on TPU)."""
    use_pallas = False
    if cfg.kernel_backend == 'pallas' and EnergieEut is not None:
        # f64 on real TPU falls back to the XLA paths below — Mosaic has
        # no f64 vector type (pk.supports_dtype)
        from ..ops import pallas_kernels as pk
        use_pallas = pk.supports_dtype(cfg.jdtype)
    if (not use_pallas
            and (cfg.dtype == 'float32' or cfg.fast_stats)
            and EnergieEut is not None):
        return _stats_fast(cfg, consts, U, EnergieEut)
    if use_pallas:
        # fused banded kernel: every full-field sum in one U+EnergieEut
        # pass + one |U-mean| pass (the measured Pallas win — the XLA
        # chain costs ~1.7 ms at N=4096 f32, see PERFORMANCE.md)
        from ..ops import pallas_kernels as pk
        if mesh is not None:
            return pk.fused_stats_sharded(
                mesh, U, EnergieEut, consts['A0'], consts['A1'],
                consts['kappa_tilde'], delx=cfg.delx, RT=cfg.RT, B=cfg.B,
                Amr=cfg.Amr, L=cfg.L, threshold=cfg.threshold)
        return pk.fused_stats(
            U, EnergieEut, consts['A0'], consts['A1'],
            consts['kappa_tilde'], delx=cfg.delx, RT=cfg.RT, B=cfg.B,
            Amr=cfg.Amr, L=cfg.L, threshold=cfg.threshold)
    N = cfg.N
    dtype = U.dtype
    A0 = consts['A0'].astype(dtype)
    A1 = consts['A1'].astype(dtype)
    kt = consts['kappa_tilde'].astype(dtype)
    DUx, DUy = gradient2d(U, cfg.delx)
    Du2 = DUx * DUx + DUy * DUy
    Uinv = 1.0 - U
    Lsq = cfg.L ** 2
    E2 = 0.5 * cfg.Amr * kt * Lsq * jnp.mean(Du2)
    E = cfg.Amr * Lsq * jnp.mean(
        cfg.RT * (U * (jnp.log(U) - cfg.B) + Uinv * jnp.log(Uinv))
        + (A0 + A1 * (Uinv - U)) * U * Uinv) + E2
    Um = U - jnp.mean(U)
    PS = jnp.sum(jnp.abs(Um)) / (N ** 2)
    if EnergieEut is None:
        L2 = jnp.asarray(0.0, dtype)
    else:
        L2 = jnp.sqrt(jnp.sum(EnergieEut * EnergieEut)) / (N ** 2)
    mid = U[N // 2 + 1, :]
    Ra = jnp.mean(jnp.abs(mid - jnp.mean(mid)))
    SA = jnp.sum((U < cfg.threshold).astype(U.dtype)) / (N ** 2)
    f64 = jnp.float64
    return (E.astype(f64), E2.astype(f64), PS.astype(f64), L2.astype(f64),
            Ra.astype(f64), SA.astype(f64))


def prepare_row0(cfg: StepConfig, consts, U):
    """Step-0 energies for prepare() (solver.py:96-116): SA=0, L2=0,
    domtime=0.  Returns (E, E2, Ra, PS) as f64 scalars."""
    E, E2, PS, _, Ra, _ = _stats(cfg, consts, U, None)
    return E, E2, Ra, PS


def _grid_constrainer(mesh, axes=('x', 'y')):
    """Returns a function pinning (N, N) arrays to the 2-D grid sharding.
    Identity when mesh is None (single device)."""
    if mesh is None:
        return lambda x: x
    spec = NamedSharding(mesh, P(*axes))

    def constrain(x):
        return lax.with_sharding_constraint(x, spec)
    return constrain


def _sharding_constrainer(sharding, stack_sharding=None):
    """Constrainer for an explicit NamedSharding (pencil layouts).
    ``stack_sharding`` handles rank-3 operands (the ozaki int8 slice
    stacks) with the same pencil orientation."""
    def constrain(x):
        if stack_sharding is not None and x.ndim == 3:
            return lax.with_sharding_constraint(x, stack_sharding)
        return lax.with_sharding_constraint(x, sharding)
    return constrain


def _layout_constrainers(cfg: StepConfig, mesh):
    """(field, spec) constrainer pair for a mesh under this config:
    pencil mode pins field/spectral to their 1-D pencil shardings,
    everything else to the 2-D grid sharding (spec=None: same as field)."""
    if mesh is None:
        return (lambda x: x), None
    if cfg.pencil:
        from ..parallel.sharding import (pencil_field_sharding,
                                         pencil_field_stack_sharding,
                                         pencil_spec_sharding,
                                         pencil_spec_stack_sharding)
        return (_sharding_constrainer(pencil_field_sharding(mesh),
                                      pencil_field_stack_sharding(mesh)),
                _sharding_constrainer(pencil_spec_sharding(mesh),
                                      pencil_spec_stack_sharding(mesh)))
    return _grid_constrainer(mesh), None


def _step(cfg: StepConfig, consts, state: SolverState, jitter_slab,
          constrain=lambda x: x, mesh=None, constrain_spec=None):
    """``constrain`` pins FIELD-space (N, N) intermediates,
    ``constrain_spec`` SPECTRAL-space ones.  They differ only in pencil
    mode (column- vs row-sharded); grid mode pins both to P('x','y')."""
    c_spec = constrain if constrain_spec is None else constrain_spec
    dtype = cfg.jdtype
    U = state.U
    EnergieEut = constrain(_nonlinear_term(cfg, consts, U, mesh))

    # --- adaptive time stepping (solver.py:177-193) ---
    if cfg.adaptive_time:
        do_adapt = ((state.computed_steps > 500)
                    & (state.computed_steps % 2 == 0))

        def adapted(delt):
            x = cfg.delt_max / jnp.sqrt(
                1.0 + ADAPT_ALPHA * jnp.abs(EnergieEut) ** 2)
            if cfg.fold_field:
                # the folded layout permutes rows within every column and
                # relabels columns.  min over columns is order-free, but
                # each column SUM must run over the natural row order to
                # keep delt (which feeds the field update) bit-identical
                # to the natural run — un-reverse the bottom-half rows;
                # columns can stay relabeled.
                n = x.shape[0]
                x = jnp.concatenate([x[:n // 2], x[n // 2:][::-1]], axis=0)
            # materialize the operand so the column sums are emitted as a
            # plain reduce in BOTH layouts: fused with the reverse above,
            # XLA's reduce rounds differently for the same values
            # (measured: 1-ULP delt forks between the folded and natural
            # chunk programs), and delt feeds the field update
            x = lax.optimization_barrier(x)
            # np.linalg.norm(..., ord=-1) on a matrix = min abs column sum
            delt_dyn = jnp.min(jnp.sum(x, axis=0)).astype(jnp.float64)
            delt_new = jnp.maximum(cfg.delt_base, delt_dyn)
            return jnp.where(delt_new / delt > 1.15,
                             0.75 * delt + 0.25 * delt_new, delt_new)

        delt = jnp.where(do_adapt, adapted(state.delt), state.delt)
        if cfg.otf_coeffs:
            # adaptive rebuilds every step anyway; the axis form drops
            # the (N, N) leig read as well (same <=1 ULP leig delta as
            # the non-adaptive path below)
            CHeig, Seig = coeffs_ops.get_coefficients_axis(
                consts['eaxis'], consts['kappa_tilde'].astype(dtype),
                delt.astype(dtype), cfg.delx2)
        else:
            CHeig, Seig = coeffs_ops.get_coefficients(
                consts['leig'], consts['kappa_tilde'].astype(dtype),
                delt.astype(dtype), cfg.delx2)
        CHeig = c_spec(CHeig)
        Seig = c_spec(Seig)
    else:
        delt = state.delt
        if cfg.otf_coeffs:
            # HBM trade: broadcast-rebuild the coefficient grids from
            # the (N,) axis inside the update's fused elementwise op —
            # drops 2 full-field reads per step on the bandwidth-bound
            # f32 path (resolver gate + measurements: PERFORMANCE.md)
            CHeig, Seig = coeffs_ops.get_coefficients_axis(
                consts['eaxis'], consts['kappa_tilde'].astype(dtype),
                delt.astype(dtype), cfg.delx2)
        else:
            CHeig, Seig = consts['CHeig'], consts['Seig']

    # --- time accumulation; limit hit aborts BEFORE the field update
    # (solver.py:195-199) ---
    tds = state.time_delta_sum + delt
    time_passed = tds / cfg.M_tilde

    def abort(state):
        return state.replace(delt=delt, time_delta_sum=tds,
                             stop_reason=jnp.asarray(STOP_TIME_LIMIT,
                                                     jnp.int32))

    def proceed(state):
        C = consts['C']
        # semi-implicit spectral update, eq. (12) of Ghiass et al (2016).
        # NOTE the 'pallas' kernel backend intentionally does NOT own the
        # transform: the hand-tiled Pallas matmul measured SLOWER than
        # XLA's (19.6 vs 9.2/6.1 ms at N=4096, PERFORMANCE.md), so pallas
        # mode = fused nonlinear term + fused stats kernels around
        # whichever transform_backend is configured.
        if cfg.transform_backend == 'split':
            # permuted spectral basis (see make_consts): transforms skip
            # the interleave relayout; Seig/CHeig are pre-permuted
            prec = cfg.mm_precision
            fprec = cfg.fwd_mm_precision
            # banded inverse (experimental): high-k tail of every split
            # block at 1-pass bf16 (ops/dct.py _mmt_banded_l)
            bf = (cfg.inv_band / cfg.N) if cfg.inv_band else None
            if cfg.fold_field:
                # U/EnergieEut live in the level-1 folded layout: the
                # level-1 reversal relayouts vanish (see ops/dct.py)
                hat_E = dct_ops.dct2_split_perm_folded(
                    EnergieEut, consts['tree'], precision=fprec,
                    constrain=constrain)
                hat_U = constrain((state.hat_U + Seig * hat_E) / CHeig)
                U = dct_ops.idct2_split_perm_folded(
                    hat_U, consts['tree'], precision=prec,
                    constrain=constrain, band_frac=bf)
            elif cfg.pencil:
                # pencil stage order: the mid-transform constraint IS the
                # transpose all-to-all (spec sharding on the forward,
                # field sharding on the inverse); every matmul contracts
                # a local axis
                hat_E = c_spec(dct_ops.dct2_split_perm(
                    EnergieEut, consts['tree'], precision=fprec,
                    constrain=c_spec))
                hat_U = c_spec((state.hat_U + Seig * hat_E) / CHeig)
                U = dct_ops.idct2_split_perm_pencil(
                    hat_U, consts['tree'], precision=prec,
                    constrain=constrain, band_frac=bf)
            else:
                hat_E = dct_ops.dct2_split_perm(EnergieEut, consts['tree'],
                                                precision=fprec,
                                                constrain=constrain)
                hat_U = constrain((state.hat_U + Seig * hat_E) / CHeig)
                U = dct_ops.idct2_split_perm(hat_U, consts['tree'],
                                             precision=prec,
                                             constrain=constrain,
                                             band_frac=bf)
        elif cfg.transform_backend == 'fft':
            hat_E = dct_ops.dct2_fft(EnergieEut, constrain=constrain)
            hat_U = constrain((state.hat_U + Seig * hat_E) / CHeig)
            U = dct_ops.idct2_fft(hat_U, constrain=constrain)
        elif cfg.transform_backend == 'ozaki':
            # under --kernels pallas the slicing chains fuse in one
            # Pallas pass (measured 3.0 vs 4.6 ms per N=4096 field,
            # bit-identical slices — PERFORMANCE.md)
            pslice = cfg.kernel_backend == 'pallas'
            # pair cutoffs: the forward (nonlinear-term) transform rides
            # the semi-implicit damping; the rfold INVERSE trim is
            # measured against the full contract in its own right
            # (resolve_ozaki_inv_pairs — same margin structure).  The
            # unfolded/folded inverse variants keep (5, 7)
            fs1, fs2 = (cfg.ozaki_fwd_pairs
                        or (ozaki_ops.STAGE1_PAIR, ozaki_ops.STAGE2_PAIR))
            is1, is2 = (cfg.ozaki_inv_pairs
                        or (ozaki_ops.STAGE1_PAIR, ozaki_ops.STAGE2_PAIR))
            if cfg.ozaki_rfold_levels:
                L = cfg.ozaki_rfold_levels
                sc = ozaki_ops.dct_rfold_scale(cfg.N, L)
                hat_E = ozaki_ops.dct2_ozaki_rfold(
                    EnergieEut, consts['rf'], sc, L, constrain=constrain,
                    pallas_slice=pslice, s1=fs1, s2=fs2)
                hat_U = constrain((state.hat_U + Seig * hat_E) / CHeig)
                U = ozaki_ops.idct2_ozaki_rfold(
                    hat_U, consts['rf'], sc, L, constrain=constrain,
                    pallas_slice=pslice, s1=is1, s2=is2)
            elif cfg.ozaki_fold:
                fs = {k: consts[k] for k in ('CeS', 'CoS', 'CeTS', 'CoTS')}
                fs['scale'] = ozaki_ops.dct_fold_scale(cfg.N)
                hat_E = ozaki_ops.dct2_ozaki_fold(EnergieEut, fs,
                                                  constrain=constrain,
                                                  pallas_slice=pslice,
                                                  s1=fs1, s2=fs2)
                hat_U = constrain((state.hat_U + Seig * hat_E) / CHeig)
                U = ozaki_ops.idct2_ozaki_fold(hat_U, fs,
                                               constrain=constrain,
                                               pallas_slice=pslice)
            elif cfg.pencil:
                # pencil-sharded ozaki: the mid int8 slice stacks cross
                # the mesh in ONE transpose all-to-all each way (exactly
                # one f64-field-equivalent of bytes: 8 int8 slots) and
                # every int8 dot contracts a local axis — 8x less wire
                # than the GSPMD-partitioned 2-D contraction
                sc = ozaki_ops.dct_scale(cfg.N)
                hat_E = c_spec(ozaki_ops.dct2_ozaki(
                    EnergieEut, consts['Cs'], consts['CsT'], sc,
                    constrain=constrain, constrain_mid=c_spec,
                    pallas_slice=pslice, s1=fs1, s2=fs2))
                hat_U = c_spec((state.hat_U + Seig * hat_E) / CHeig)
                U = ozaki_ops.idct2_ozaki(
                    hat_U, consts['Cs'], consts['CsT'], sc,
                    constrain=c_spec, constrain_mid=constrain,
                    pallas_slice=pslice, pencil=True)
            else:
                sc = ozaki_ops.dct_scale(cfg.N)
                hat_E = ozaki_ops.dct2_ozaki(EnergieEut, consts['Cs'],
                                             consts['CsT'], sc,
                                             constrain=constrain,
                                             pallas_slice=pslice,
                                             s1=fs1, s2=fs2)
                hat_U = constrain((state.hat_U + Seig * hat_E) / CHeig)
                U = ozaki_ops.idct2_ozaki(hat_U, consts['Cs'],
                                          consts['CsT'], sc,
                                          constrain=constrain,
                                          pallas_slice=pslice)
        else:
            prec = cfg.mm_precision
            hat_E = dct_ops.dct2(EnergieEut, C, precision=cfg.fwd_mm_precision,
                                 constrain=constrain)
            hat_U = constrain((state.hat_U + Seig * hat_E) / CHeig)
            if cfg.inv_band:
                U = dct_ops.idct2_banded(hat_U, C, cfg.inv_band,
                                         precision=prec,
                                         constrain=constrain)
            else:
                U = dct_ops.idct2(hat_U, C, precision=prec,
                                  constrain=constrain)

        rng_key = state.rng_key
        if cfg.jitter_mode == 'stream' or cfg.jitter_mode == 'static':
            U = U + cfg.jitter * (2.0 * jitter_slab.astype(dtype) - 1.0)
        elif cfg.jitter_mode == 'device_sobol':
            # on-device scrambled Sobol, bit-exact with the host scipy
            # stream (ops/sobol.py): draw index = draws consumed before
            # this step (the initial field's points ride in
            # consts['sobol_base']; one N-point draw per prior step)
            from ..ops import sobol as sobol_ops
            base = (consts['sobol_base']
                    + (state.computed_steps - 1).astype(jnp.uint32)
                    * jnp.uint32(cfg.N))
            r = sobol_ops.sobol_points(
                consts['sobol_sv'], consts['sobol_shift'], base,
                cfg.N).astype(dtype)
            if cfg.fold_field:
                r = dct_ops.fold1(r)
            U = U + cfg.jitter * (2.0 * r - 1.0)
        elif cfg.jitter_mode == 'device':
            rng_key, sub = jax.random.split(rng_key)
            r = jax.random.uniform(sub, (cfg.N, cfg.N), dtype)
            if cfg.fold_field:
                # match the natural-layout trajectory bit-for-bit: the
                # same slab values land on the same original cells
                r = dct_ops.fold1(r)
            U = U + cfg.jitter * (2.0 * r - 1.0)
        U = constrain(U)

        E, E2, PS, L2, Ra, SA = _stats(cfg, consts, U, EnergieEut, mesh)
        domtime = time_passed ** (1.0 / 3.0)
        it = state.computed_steps  # row stores the pre-increment count
        row = jnp.stack([it.astype(jnp.float64), E, E2, SA, domtime,
                         Ra, L2, PS, delt])
        rowbuf = lax.dynamic_update_slice(
            state.rowbuf, row[None, :],
            (state.rows, jnp.asarray(0, jnp.int32)))
        steps_new = state.computed_steps + 1

        # NaN health guard (reference: assert in timedata.insert)
        has_nan = jnp.any(jnp.isnan(row))

        # early-stop predicate E2[it-1] > E2[it] > E2[0] (timedata.py:51-63)
        falls = (state.E2_prev > E2) & (E2 > state.E2_first)
        trigger = falls & jnp.logical_not(state.skip_check)
        tau0 = jnp.where(trigger, steps_new.astype(jnp.float64), state.tau0)
        t0 = jnp.where(trigger, time_passed, state.t0)
        if cfg.full_sim:
            skip_check = state.skip_check | trigger
            stop = jnp.asarray(STOP_NONE, jnp.int32)
        else:
            skip_check = state.skip_check
            stop = jnp.where(trigger, STOP_ENERGY, STOP_NONE).astype(jnp.int32)
        stop = jnp.where(has_nan, STOP_NAN, stop).astype(jnp.int32)

        if cfg.spectral_bf16:
            # bf16 storage: this step's inverse consumed the full-
            # precision in-register hat_U; only the carried state is
            # rounded (the next step's read promotes bf16 -> f32)
            hat_U = hat_U.astype(jnp.bfloat16)
        return state.replace(
            U=U, hat_U=hat_U, delt=delt, time_delta_sum=tds,
            computed_steps=steps_new, skip_check=skip_check,
            stop_reason=stop, tau0=tau0, t0=t0, E2_prev=E2,
            rows=state.rows + 1, rowbuf=rowbuf, rng_key=rng_key)

    if cfg.time_limit is None:
        return proceed(state)
    return lax.cond(time_passed > cfg.time_limit, abort, proceed, state)


def _chunk_body(cfg: StepConfig, constrain, mesh=None, constrain_spec=None):
    """Raw (unjitted) chunk runner: up to ``n_iters`` steps under an
    on-device while_loop, stopping early when stop_reason != 0.  ``mesh``
    is only passed for the Pallas-kernel sharded path (shard_map regions
    need the concrete mesh; the XLA path shards via GSPMD constraints).
    ``constrain_spec`` pins spectral-space intermediates when it differs
    from the field constraint (pencil mode)."""
    use_stream = cfg.jitter_mode == 'stream'
    use_static = cfg.jitter_mode == 'static'

    def run(state: SolverState, n_iters, consts, jitter_buf):
        def cond(carry):
            s, i = carry
            return (i < n_iters) & (s.stop_reason == STOP_NONE)

        def body(carry):
            s, i = carry
            if use_stream:
                slab = jitter_buf[i]
            elif use_static:
                slab = jitter_buf
            else:
                slab = None
            return _step(cfg, consts, s, slab, constrain, mesh,
                         constrain_spec), i + 1

        state, _ = lax.while_loop(cond, body,
                                  (state, jnp.asarray(0, jnp.int32)))
        return state

    return run


def make_chunk_runner(cfg: StepConfig, mesh=None):
    """Jitted ``run(state, n_iters, consts, jitter_buf) -> state``.
    ``n_iters`` is traced, so chunk after chunk reuses one executable.
    With ``mesh``, (N, N) arrays are pinned to the 2-D P('x','y') grid
    sharding (distributed matmul-DCT via XLA collectives); the Pallas
    kernel backend additionally runs its kernels per-shard under
    shard_map with halo exchange."""
    pallas_mesh = mesh if cfg.kernel_backend == 'pallas' else None
    c_field, c_spec = _layout_constrainers(cfg, mesh)
    run = _chunk_body(cfg, c_field, pallas_mesh, c_spec)
    return jax.jit(run, donate_argnums=(0,))


def make_ensemble_runner(cfg: StepConfig, mesh=None):
    """Vmapped ensemble runner: batches the whole chunk over a leading
    member axis (state leaves, CHeig, A0/A1/kappa_tilde batched; the DCT
    matrix, eigenvalue grid, n_iters and jitter stream shared).

    A vmapped ``lax.while_loop`` gives per-member early stop for free:
    iteration continues while ANY member is active and finished members'
    states are frozen by the predicate select — the TPU-native equivalent
    of the reference's per-process Monte-Carlo pool
    (``chsimpy/experiment.py:197-216``).

    With a mesh containing an 'ens' axis, the member axis is sharded over
    it (``spmd_axis_name``); with ('x','y') axes too, each member's grid is
    additionally sharded (sharding constraints gain the member axis
    automatically)."""
    spmd = None
    grid_mesh = None
    if mesh is not None:
        if 'ens' in mesh.axis_names:
            spmd = 'ens'
        if 'x' in mesh.axis_names and 'y' in mesh.axis_names:
            grid_mesh = mesh
    c_field, c_spec = _layout_constrainers(cfg, grid_mesh)
    run = _chunk_body(cfg, c_field, constrain_spec=c_spec)
    vrun = jax.vmap(run,
                    in_axes=(0, None, CONSTS_BATCH_AXES, None),
                    spmd_axis_name=spmd)
    return jax.jit(vrun, donate_argnums=(0,))


def make_entry_dct2(cfg: StepConfig, mesh=None):
    """(U, consts) -> spectral image of U via the configured transform
    route (the reference recomputes hat_U at every API entry,
    solver.py:159).  Entry runs at HIGHEST precision — once per entry,
    accuracy is free here."""
    if cfg.transform_backend == 'split':
        # permuted basis — must match the in-loop step's spectral layout
        if cfg.fold_field:
            # entry U is device state, i.e. already level-1 folded
            return lambda U, consts: dct_ops.dct2_split_perm_folded(
                U, consts['tree'])
        if cfg.pencil and mesh is not None:
            _, c_spec = _layout_constrainers(cfg, mesh)
            return lambda U, consts: c_spec(dct_ops.dct2_split_perm(
                U, consts['tree'], constrain=c_spec))
        return lambda U, consts: dct_ops.dct2_split_perm(U, consts['tree'])
    if cfg.transform_backend == 'fft':
        return lambda U, consts: dct_ops.dct2_fft(U)
    if cfg.transform_backend == 'ozaki':
        if cfg.ozaki_rfold_levels:
            L = cfg.ozaki_rfold_levels
            sc = ozaki_ops.dct_rfold_scale(cfg.N, L)
            return lambda U, consts: ozaki_ops.dct2_ozaki_rfold(
                U, consts['rf'], sc, L)
        if cfg.ozaki_fold:
            def entry_fold(U, consts):
                fs = {k: consts[k] for k in ('CeS', 'CoS', 'CeTS', 'CoTS')}
                fs['scale'] = ozaki_ops.dct_fold_scale(cfg.N)
                return ozaki_ops.dct2_ozaki_fold(U, fs)
            return entry_fold
        if cfg.pencil and mesh is not None:
            _, c_spec = _layout_constrainers(cfg, mesh)
            return lambda U, consts: c_spec(ozaki_ops.dct2_ozaki(
                U, consts['Cs'], consts['CsT'], ozaki_ops.dct_scale(cfg.N),
                constrain_mid=c_spec))
        return lambda U, consts: ozaki_ops.dct2_ozaki(
            U, consts['Cs'], consts['CsT'], ozaki_ops.dct_scale(cfg.N))
    return lambda U, consts: dct_ops.dct2(U, consts['C'])


def make_prepare(cfg: StepConfig):
    return jax.jit(lambda consts, U: prepare_row0(cfg, consts, U))


def make_ensemble_prepare(cfg: StepConfig):
    return jax.jit(jax.vmap(lambda consts, U: prepare_row0(cfg, consts, U),
                            in_axes=(CONSTS_BATCH_AXES, 0)))
