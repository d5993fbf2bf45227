"""Host driver for the on-device Cahn-Hilliard integrator.

API mirrors the reference ``Solver`` (``chsimpy/solver.py:17-252``):
``prepare()`` then ``solve_or_resume(nsteps)`` (repeatable, used by the
live-view chunk loop).  Internally, time stepping runs in device chunks
(``chunk_size`` steps per ``lax.while_loop`` launch); the host syncs one
scalar per chunk, appends the chunk's timedata rows, and honors the exact
reference iteration-count semantics:

* fresh solve (computed_steps == 1) runs ``nsteps - 1`` iterations,
  a resume runs ``nsteps`` (solver.py:160-163);
* ``hat_U`` is recomputed from U at every *API entry* (solver.py:159), but
  carried across internal device chunks (which the reference has no
  equivalent of — internal chunking is invisible in the results);
* ``prepare()`` resets exactly what the reference resets (NOT
  time_delta_sum / delt / skip_check — quirk preserved, solver.py:84-135).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..derived import Derived
from ..ops import dct as dct_ops
from ..params import Parameters
from ..rng import FieldGenerator
from ..solution import Solution
from ..timedata import TimeData
from . import state as state_mod
from .state import STOP_NAN, STOP_NONE, STOP_STRINGS, SolverState
from .stepper import (StepConfig, make_chunk_runner, make_consts,
                      make_entry_dct2, make_prepare)

_JITTER_BUF_BYTES = 64 << 20  # cap on the per-chunk host jitter pre-draw

# measured crossover of the folded-matmul (split) route vs the plain MXU
# matmul DCT on one v5e chip, float32 (benchmarks/dct_bench.py, table in
# PERFORMANCE.md: split2-high 6.1 ms vs matmul-high 9.2 ms at N=4096)
SPLIT_MIN_N = 1024


def resolve_fold_field(params: Parameters, grid_sharded: bool = None) -> bool:
    """Resolve Parameters.fold_field (None = auto) for this run.

    Auto folds whenever it composes: split transform route, member-local
    fields (no grid sharding), XLA kernels.  Measured on the v5e chip
    (artifacts/r3/capture_r3.log): +3.6% end-to-end at N=4096 f32 (117.2
    vs 113.1 steps/s); the stats regroup their sums (ULP-order trace
    shift).  At equal split depth the folded layout is pure data movement
    (U trajectory bit-identical); note the *auto* depth resolver picks one
    more fold level under the folded layout at N>=4096 (measured faster
    there), so default folded/natural trajectories differ at those sizes —
    pin ``--split-levels`` for a bit-identity A/B.

    ``grid_sharded`` overrides the "is the field split across devices"
    test for callers with their own runtime mesh (EnsembleSolver: an
    'ens'-only mesh keeps fields member-local and composes with the fold;
    an x/y grid axis does not).  Default: params.mesh_shape decides.

    Why the two exclusions stand (round-4 adjudication of the
    compose-or-prove question):

    * mesh — the fold pairs row i with row N-1-i and column j with
      column N-1-j.  Under the pencil layout (the sharded split route)
      the COLUMN pairing crosses column shards, so a full fold would
      reintroduce a cross-device permute per step on the layout
      boundary it exists to remove.  A row-only fold IS local under
      pencil and would recover about half the measured +3.6% — i.e.
      <=2% of a path whose predicted ceiling is communication-bound
      anyway (SCALING_PREDICTED); not worth forking the transform,
      stats seam handling and checkpoint layouts into a third
      (row-folded) variant.  Revisit only if real-hardware profiles
      show the relayouts, not the wire, as the sharded bottleneck.
    * pallas kernels — the banded stencil kernels key their one-sided
      edge handling and halo exchange on spatially ADJACENT rows/cols;
      the folded layout breaks adjacency at the two seams.  Fold-aware
      kernels are a full rewrite of the halo logic to buy +3.6% on a
      backend that is itself not the measured default (PERFORMANCE.md
      'Pallas verdict') — recorded as not worth it.
    """
    ff = getattr(params, 'fold_field', None)
    if ff is not None:
        return bool(ff)
    if grid_sharded is None:
        grid_sharded = params.mesh_shape is not None
    return (not grid_sharded
            and getattr(params, 'kernel_backend', 'xla') == 'xla'
            and resolve_transform(params) == 'split')


def _resolve_rfold_levels(params: Parameters, grid_sharded: bool = None
                          ) -> int:
    """Fold depth of the recursive permuted ozaki route (0 = use the
    level-1 natural fold / unfolded sharded route).

    Engages for member-local ozaki at N >= 1024 — measured at N=4096 on
    the chip (PERFORMANCE.md round 4): rfold 35-37 vs fold's 42.4 ms/rt.
    N < 1024 keeps the level-1 natural fold: the canonical N=512 f64
    validation run (exact stop step 1674 on chip) stays on its proven
    path, and the small blocks the deeper recursion makes are below MXU
    efficiency anyway.  Depth is clamped by the int32 group bound
    65*65*8*N*2^L < 2^31 (ops/ozaki.py) and by divisibility."""
    if grid_sharded is None:
        grid_sharded = params.mesh_shape is not None
    if grid_sharded or _resolve_transform(params) != 'ozaki':
        return 0
    N = params.N
    if N < 1024:
        return 0
    # depth 2 is the measured optimum at N=4096 (35.1 ms/rt vs 36.9 at
    # L=1 and 36.2 at L=3 — deeper folds shrink blocks below MXU
    # efficiency, artifacts/r4/rfold_bench.log); at N=8192 depth 2 OOMs
    # the 16 GB HBM (live int32 group planes of the (L+1)^2 block pairs)
    # while depth 1 fits at 2.48 steps/s (artifacts/r4/mem_f64_8192.json)
    max_L = 2 if N <= 4096 else 1
    L = 0
    while (L < max_L and N % (2 ** (L + 1)) == 0
           and N * 2 ** (L + 1) <= 63550):
        L += 1
    return L


def resolve_transform(params: Parameters) -> str:
    """Resolve Parameters.transform_backend ('auto' allowed) to the
    concrete route for this run ('matmul' | 'split' | 'fft' | 'ozaki')."""
    return _resolve_transform(params)


def resolve_fwd_matmul_precision(params: Parameters) -> str:
    """Forward-transform MXU precision (None = follow matmul_precision).

    Measured adoption (round 4, chip — scripts/probes/fwd_precision*.py):
    the forward DCT of the nonlinear term enters the update through the
    semi-implicit damping Seig/CHeig, so a 1-pass bf16 forward keeps the
    f32 E trace IN CLASS (N=2048 vs f64 truth: 2.863e-6 both ways;
    canonical N=512: 1.4e-6 -> 2.0e-6) while the inverse — whose output
    IS the field — stays at 3-pass.  N=4096 f32: 188.7 -> 225.4 steps/s
    (+19%).  Auto engages only where measured free: float32, the split
    route, N >= 2048, and ONLY when the user did not pin
    --matmul-precision (an explicit precision request keeps the
    transforms symmetric); N < 2048 keeps the documented stop-step
    scatter band (the 1-pass forward widens it: canonical stop 1669 ->
    1683).  float64 and the int8 ozaki route are untouched."""
    fwd = getattr(params, 'fwd_matmul_precision', None)
    if fwd is not None:
        return fwd
    if (params.precision == 'float32'
            and getattr(params, 'matmul_precision', None) is None
            and params.N >= 2048
            and _resolve_transform(params) == 'split'):
        return 'default'
    return None


def resolve_inv_band(params: Parameters):
    """Banded-precision inverse cutoff (None = uniform precision).

    Measured adoption (round 5, chip — scripts/probes/inv_band_split.py
    / inv_band_attack.py): the CH spectrum's high-k tail is ~1.6e-4 of
    the dominant band (k >= N/4, mid-coarsening), so contracting it at
    1-pass bf16 leaves the full-run N=2048 E trace IDENTICAL to the
    printed digit (3.41e-6 vs f64 truth, both routes, N/4 and N/8) with
    stop steps inside the documented f32 scatter band — while cutting
    the inverse's MXU passes in half below the cutoff: split route
    N=2048 1433 -> 1669 steps/s (+16%), N=4096 265.6 -> 277.0 (+4%).

    Auto engages for float32, split route, N >= 1024, no pinned
    --matmul-precision — and single-device only (the pencil banding is
    wired but not yet measured under a mesh).  N=1024 joined the gate
    late in round 5 by direct measurement: 2594 -> 2726 steps/s with
    the full N=1024 f32 run's E max rel vs f64 truth IDENTICAL
    (1.566e-06) and the stop step unchanged (1828); the asymmetric
    FORWARD keeps its own N >= 2048 gate (it moves the stop).
    ``--inv-band 0`` forces uniform precision; an explicit value
    overrides."""
    ib = getattr(params, 'inv_band', None)
    if ib is not None:
        return None if ib == 0 else ib
    if (params.precision == 'float32'
            and getattr(params, 'matmul_precision', None) is None
            and params.N >= 1024
            and params.mesh_shape is None
            and _resolve_transform(params) == 'split'):
        return params.N // 4
    return None


def resolve_otf_coeffs(params: Parameters):
    """Per-step on-the-fly Seig/CHeig rebuild (coeffs.get_coefficients_axis).

    Auto engages under the f32 fast-mode gate (float32, split route,
    N >= 2048, single device, no pinned --matmul-precision — the same
    conditions as the asymmetric forward and the banded inverse): the
    step there is HBM-bound (PERFORMANCE.md round-5 roofline) and the
    rebuild drops 2 full-field reads per step for ~5 VPU flops/element.
    The only numerical delta is <=1 ULP on the leig broadcast add
    (f32(e_i)+f32(e_j) vs the stored grid's f64 add then cast), measured
    sub-noise on the E trace.  float64 keeps the stored grids: the
    validation contract is bit-level and the emulated-f64 rebuild would
    cost, not save.  ``--otf-coeffs 1`` forces it on (any route that
    reads Seig/CHeig, incl. vmapped ensembles — saves the per-member
    (N, N) CHeig batch); ``0`` forces off."""
    oc = getattr(params, 'otf_coeffs', None)
    if oc is not None:
        return bool(oc)
    # N >= 1024: measured late in round 5 (2594 -> 2657 steps/s alone,
    # 2726-2766 with the banded inverse; E digit and stop step both
    # unchanged on the full N=1024 f32 run)
    return (params.precision == 'float32'
            and getattr(params, 'matmul_precision', None) is None
            and params.N >= 1024
            and params.mesh_shape is None
            and _resolve_transform(params) == 'split')


def resolve_ozaki_fwd_pairs(params: Parameters):
    """Forward pair cutoffs for the f64 ozaki transforms.

    The same damping asymmetry as resolve_fwd_matmul_precision, in the
    int8 route's terms: the forward transform of the nonlinear term may
    drop slice-product passes the inverse must keep.  Measured cutoff
    sweep on the chip (scripts/probes/ozaki_fwd_trim.py — canonical
    N=512 f64 run, all rows stop at exactly 1674):

        fwd pairs  max rel E    N=4096 f64 steps/s
        (5, 7)     5.06e-11     17.5   (the round-4 entry default)
        (4, 6)     5.06e-11     18.6
        (3, 5)     5.05e-11     19.5   <- default: E at the floor, the
                                          trim term is ~2 slots (128^2)
                                          below the breach point
        (3, 4)     4.43e-11     19.9
        (2, 4)     3.90e-11     20.3   <- fastest contract-passing row
        (2, 3)     6.26e-10     20.4   <- BREACH (> 1e-10): the cliff

    (3, 5) is the default: one canonical run is one sample, so the
    default keeps two powers of 128 between its trim term and the
    measured cliff; set params.ozaki_fwd_pairs = (2, 4) to trade that
    margin for +4%, or (5, 7) to disable trimming.  The INVERSE trim
    has its own resolver (resolve_ozaki_inv_pairs)."""
    pairs = getattr(params, 'ozaki_fwd_pairs', None)
    if pairs is not None:
        return tuple(pairs)
    return (3, 5)


def resolve_ozaki_inv_pairs(params: Parameters):
    """INVERSE pair cutoffs for the f64 ozaki rfold route.

    Round 4 left the inverse at the untrimmed (5, 7) on the argument
    that it has no damping shield — its output IS the field.  Round 5
    measured it (scripts/probes/ozaki_inv_trim.py — N=1024 full-run
    golden, rfold production path, fwd trim active):

        inv pairs  max rel E    stop        N=4096 f64 steps/s
        (5, 7)     5.619e-11    1837 exact  17.5  (same-day baseline)
        (4, 6)     5.619e-11    1837 exact  21.1
        (3, 5)     5.609e-11    1837 exact  23.4  <- default (+34%)
        (2, 4)     4.300e-11    1837 exact  —     fastest passing
        (2, 3)     4.490e-09    1808 FAIL   —     the cliff
        (1, 2)     9.818e-06    1494 FAIL   —

    Identical margin structure to the forward: the E floor is untouched
    down to (2, 4) and the cliff sits at (2, 3), so the (3, 5) default
    keeps the same two-powers-of-128 distance from the breach as the
    forward's.  Gated by the full chip golden-replay battery (all
    exact stops, E <= 6.3e-11).  Applies to the RFOLD inverse only —
    the unfolded/folded inverse variants (ensemble width gates, pencil)
    keep (5, 7) until measured on those paths.  Set
    params.ozaki_inv_pairs = (5, 7) to disable trimming."""
    pairs = getattr(params, 'ozaki_inv_pairs', None)
    if pairs is not None:
        return tuple(pairs)
    return (3, 5)


def _resolve_transform(params: Parameters) -> str:
    tb = getattr(params, 'transform_backend', 'auto') or 'auto'
    if tb == 'auto':
        if params.mesh_shape is not None:
            if (params.precision == 'float64'
                    and jax.default_backend() == 'tpu'
                    and params.N >= 256):
                # the int8 pair dots shard exactly like the matmul
                # contraction (GSPMD dot partitioning; equivalence pinned
                # on the virtual mesh) and each is ~100x the emulated-f64
                # matmul's per-chip rate
                return 'ozaki'
            D = params.mesh_shape[0] * params.mesh_shape[1]
            if (params.precision == 'float32'
                    and params.N >= SPLIT_MIN_N and params.N % 4 == 0
                    and params.N % D == 0
                    and getattr(params, 'kernel_backend', 'xla') == 'xla'):
                # split route under the PENCIL layout: every matmul
                # contracts a local axis and the transform communication
                # collapses to 2 transpose all-to-alls per step — 5-8x
                # less wire than the grid-sharded matmul contraction
                # (parallel/sharding.py, SCALING_PREDICTED.json)
                return 'split'
            return 'matmul'  # sharded contraction: local matmul + collective
        if (params.precision == 'float64'
                and jax.default_backend() == 'tpu' and params.N >= 256):
            # emulated-f64 matmuls are 85% of the TPU f64 step; the Ozaki
            # int8-slice route replaces them with exact MXU int8 passes
            # (faster AND more accurate than the emulation — ops/ozaki.py,
            # PERFORMANCE.md).  The CPU backend keeps matmul — it is the
            # bit-level validated contract path.
            return 'ozaki'
        if params.N >= SPLIT_MIN_N and params.N % 4 == 0:
            if params.precision == 'float32':
                return 'split'
            if jax.default_backend() == 'tpu':
                return 'split'
        return 'matmul'
    if tb == 'fft' and params.mesh_shape is not None:
        raise ValueError(
            "--transform fft does not shard under --mesh; the "
            "distributed transforms are the split (pencil layout), "
            "matmul and ozaki routes")
    if tb == 'split' and params.mesh_shape is not None:
        D = params.mesh_shape[0] * params.mesh_shape[1]
        if params.N % D:
            raise ValueError(
                f"--transform split under --mesh uses the pencil layout, "
                f"which needs N divisible by the device count {D} "
                f"(got N={params.N})")
        if getattr(params, 'kernel_backend', 'xla') == 'pallas':
            raise ValueError(
                "--transform split under --mesh (pencil layout) requires "
                "--kernels xla (the sharded Pallas stencils assume the "
                "2-D grid layout)")
    if tb in ('fft', 'split'):
        if params.N % 2:
            raise ValueError(f"--transform {tb} requires even N "
                             f"(got {params.N})")
    if tb == 'ozaki' and params.precision != 'float64':
        raise ValueError(
            "--transform ozaki is the float64 transform (int8 slice "
            "decomposition of the double-single representation); float32 "
            "runs use --transform split or matmul")
    if tb == 'fft' and (params.precision == 'float64'
                        and jax.default_backend() == 'tpu'):
        raise ValueError(
            "float64 FFT needs complex128, which TPU does not "
            "support; float64 validation mode uses --transform matmul")
    return tb


class Solver:
    """Cahn-Hilliard (CH) integrator: semi-implicit spectral method over the
    2-D DCT, Flory-Huggins energy with linear Redlich-Kister interaction.
    See Ghiass et al (2016), JMS Part B 55(4):411-425."""

    def __init__(self, params: Parameters = None, U_init=None):
        self.params = params if params is not None else Parameters()
        params = self.params
        self.derived = Derived.from_params(params)
        self.solution = Solution(params, self.derived)
        N = params.N

        self.skip_check = False
        self.time_delta_sum = 0.0
        self.time_passed = 0.0
        self._prepared = False
        self._ckpt_last_saved = None
        self.delt = params.delt

        # --- initial field (host-side, bit-exact generators) ---
        self.generator: Optional[FieldGenerator] = None
        if U_init is not None:
            U_init = np.asarray(U_init)
            if U_init.shape != (N, N):
                raise ValueError(
                    f"U_init has wrong shape {U_init.shape}, "
                    f"must be ({N}, {N})")
            self.U_init = np.asarray(U_init, dtype=np.float64)
        else:
            self.generator = FieldGenerator(params.generator, N, params.seed)
            self.U_init = self.generator.initial_field(params.XXX)

        # --- jitter configuration ---
        jitter_on = (params.jitter is not None
                     and 0.0 < params.jitter < 0.1)
        if jitter_on and params.generator == 'lcg' and U_init is None:
            raise ValueError("jitter requires a sample stream; the 'lcg' "
                             "generator has none (matches reference)")
        if jitter_on:
            if params.generator == 'simplex':
                jitter_mode = 'static'
            elif (params.jitter_backend == 'device'
                  and params.generator == 'sobol'):
                # on-device scrambled Sobol: bit-exact with the scipy
                # stream AND no per-chunk host slab uploads (ops/sobol.py)
                jitter_mode = 'device_sobol'
            elif (params.jitter_backend == 'device'
                  and params.generator == 'uniform'):
                jitter_mode = 'device'
            else:
                jitter_mode = 'stream'
        else:
            jitter_mode = 'none'
        self._jitter_mode = jitter_mode

        time_limit = None
        if params.time_max is not None and params.time_max > 0:
            time_limit = params.time_max * 60.0

        sl = getattr(params, 'split_levels', None)
        if sl is not None and not (1 <= sl and N % (2 ** sl) == 0):
            raise ValueError(
                f"--split-levels {sl} needs N divisible by 2^levels "
                f"(got N={N})")
        ib = getattr(params, 'inv_band', None)
        if ib is not None and ib != 0:
            if params.precision != 'float32':
                raise ValueError(
                    "--inv-band is a float32 fast-mode knob (a 1-pass "
                    "bf16 band would break the float64 validation "
                    "contract)")
            if not (0 < ib < N):
                raise ValueError(
                    f"--inv-band must be in (0, N) or 0 for uniform "
                    f"precision, got {ib}")
            if resolve_transform(params) not in ('matmul', 'split'):
                raise ValueError(
                    "--inv-band applies to the matmul and split routes")
        if getattr(params, 'spectral_bf16', False):
            # probe-only knob (measured negative — params.py); keep the
            # contract guard so the probe can't be misapplied
            if params.precision != 'float32' or params.mesh_shape:
                raise ValueError("spectral_bf16 is a single-device "
                                 "float32 probe knob")
        fold_field = resolve_fold_field(params)
        if fold_field:
            if params.mesh_shape is not None:
                raise ValueError("--fold-field is single-device only "
                                 "(the folded seam crosses shard halves)")
            if resolve_transform(params) != 'split':
                raise ValueError(
                    "--fold-field needs the split transform route "
                    "(the fold is a property of its level-1 layout)")
            if params.kernel_backend != 'xla':
                raise ValueError("--fold-field requires --kernels xla "
                                 "(the Pallas stencils assume the natural "
                                 "layout)")

        d = self.derived
        self.cfg = StepConfig(
            N=N,
            dtype=params.precision,
            RT=d.RT, BRT=d.BRT, B=params.B,
            Amr=d.Amr, L=params.L, delx=d.delx, delx2=d.delx2,
            M_tilde=params.M_tilde,
            threshold=params.threshold,
            A0=d.A0, A1=d.A1, kappa_tilde=d.kappa_tilde,
            delt_base=params.delt, delt_max=params.delt_max,
            adaptive_time=params.adaptive_time,
            time_limit=time_limit,
            full_sim=params.full_sim,
            jitter=params.jitter if jitter_on else None,
            jitter_mode=jitter_mode,
            kernel_backend=params.kernel_backend,
            transform_backend=resolve_transform(params),
            matmul_precision=params.matmul_precision or (
                'high' if params.precision == 'float32' else 'highest'),
            fwd_matmul_precision=resolve_fwd_matmul_precision(params),
            inv_band=resolve_inv_band(params),
            otf_coeffs=resolve_otf_coeffs(params),
            spectral_bf16=bool(getattr(params, 'spectral_bf16', False)),
            # f64 on TPU: restructured stats keep the 1e-10 E contract
            # (verified by on-chip golden replay); CPU f64 keeps the
            # reference summation order (bit-level validation path).
            # fold_field requires the restructured reductions (only they
            # have fold-aware slicing), so it forces fast_stats
            fast_stats=(jax.default_backend() == 'tpu') or fold_field,
            fold_field=fold_field,
            split_levels=getattr(params, 'split_levels', None),
            # folded int8 blocks halve the transform MACs on one device
            # (measured 42.3 vs 48.5 ms/rt at N=4096 — PERFORMANCE.md);
            # the sharded route keeps the GSPMD-partitioned unfolded dots
            ozaki_fold=(resolve_transform(params) == 'ozaki'
                        and params.mesh_shape is None and N % 2 == 0),
            ozaki_rfold_levels=_resolve_rfold_levels(params),
            ozaki_fwd_pairs=resolve_ozaki_fwd_pairs(params),
            ozaki_inv_pairs=resolve_ozaki_inv_pairs(params),
            # the split and ozaki routes shard via the pencil layout (2
            # transpose all-to-alls per step — for ozaki, of the int8
            # slice stacks) instead of the 2-D grid contraction; needs
            # even shards and the XLA kernels (the sharded Pallas
            # stencils assume the grid layout)
            pencil=(params.mesh_shape is not None
                    and resolve_transform(params) in ('split', 'ozaki')
                    and N % (params.mesh_shape[0]
                             * params.mesh_shape[1]) == 0
                    and params.kernel_backend == 'xla'),
        )

        # optional 2-D grid sharding over a device mesh
        self.mesh = None
        if params.mesh_shape is not None:
            from ..parallel.mesh import make_grid_mesh
            self.mesh = make_grid_mesh(params.mesh_shape)
            if params.kernel_backend == 'pallas':
                # the banded kernels run per shard (shard_map + halo
                # exchange); local blocks must tile to the (8, 128) VPU
                # geometry
                mx, my = params.mesh_shape
                if N % (mx * 8) or N % my:
                    raise ValueError(
                        f"kernel_backend='pallas' with mesh {mx}x{my} "
                        f"needs N divisible by {mx * 8} (8-row bands per "
                        f"x-shard) and by {my}; got N={N}")

        # chunk size: device steps per host round-trip
        self.chunk_size = max(1, int(params.chunk_size))
        if jitter_mode == 'stream':
            per_step = N * N * 8
            self.chunk_size = max(
                1, min(self.chunk_size, _JITTER_BUF_BYTES // per_step))

        self._consts = make_consts(self.cfg, self.delt)
        if self.cfg.jitter_mode == 'device_sobol':
            from ..ops import sobol as sobol_ops
            sv, sh = sobol_ops.sobol_tables(N, params.seed)
            self._consts.update(sobol_sv=jnp.asarray(sv),
                                sobol_shift=jnp.asarray(sh))
        if self.mesh is not None:
            from ..parallel.sharding import shard_consts
            self._consts = shard_consts(self._consts, self.mesh,
                                        pencil=self.cfg.pencil)
        self._run_chunk = make_chunk_runner(self.cfg, mesh=self.mesh)
        self._prepare_stats = make_prepare(self.cfg)
        # NOTE: the DCT matrix / block tree is an *argument*, never a
        # closure capture — large constants embedded in HLO compile
        # pathologically slowly on the TPU compile service.  The entry
        # recompute uses the same transform route as the in-loop step.
        self._dct2 = jax.jit(make_entry_dct2(self.cfg, mesh=self.mesh))
        if self.cfg.fold_field:
            from ..ops.dct import fold1
            self._fold1_dev = jax.jit(fold1)  # involution: fold == unfold
        self._state: Optional[SolverState] = None
        # placeholder so the runner signature is stable in all modes
        self._null_jbuf = jnp.zeros((), self.cfg.jdtype)
        # static jitter buffer is drawn lazily at first use: with an
        # explicit U_init there is no generator yet, and checkpoint
        # restore installs the saved stream *after* construction
        self._static_jbuf = None

    # ------------------------------------------------------------------
    def prepare(self) -> None:
        """Initial computations before the simulation loop
        (reference solver.py:84-135)."""
        U0 = jnp.asarray(self.U_init, self.cfg.jdtype)
        if self.mesh is not None:
            from ..parallel.sharding import (grid_sharding,
                                             pencil_field_sharding)
            place = (pencil_field_sharding(self.mesh) if self.cfg.pencil
                     else grid_sharding(self.mesh))
            U0 = jax.device_put(U0, place)
        E, E2, Ra, PS = self._prepare_stats(self._consts, U0)
        E, E2, Ra, PS = (float(E), float(E2), float(Ra), float(PS))

        data = TimeData()
        data.insert(it=0, delt=self.delt, E=E, E2=E2, SA=0, domtime=0,
                    Ra=Ra, L2=0, PS=PS)

        U0_state = U0
        if self.cfg.fold_field:
            # row-0 stats above ran on the natural layout; the device
            # state lives level-1 folded from here on (solution.U stays
            # the natural view)
            U0_state = self._fold1_dev(U0)
        self._state = state_mod.init_state(
            U0=U0_state,
            # rebuilt at solve entry; carried bf16 under --spectral-bf16
            hat_U0=jnp.zeros_like(
                U0, dtype=(jnp.bfloat16 if self.cfg.spectral_bf16
                           else U0.dtype)),
            delt=self.delt,
            E2_first=E2,
            chunk_cap=self.chunk_size,
            seed=self.params.seed,
        )
        # quirk parity: prepare() does NOT reset time_delta_sum/skip_check
        self._state = self._state.replace(
            time_delta_sum=jnp.asarray(self.time_delta_sum, jnp.float64),
            skip_check=jnp.asarray(self.skip_check),
        )
        if self.mesh is not None:
            from ..parallel.sharding import shard_state
            self._state = shard_state(self._state, self.mesh,
                                      pencil=self.cfg.pencil)
        self.solution.U = U0
        self.solution.timedata = data
        self.solution.tau0 = 0.0
        self.solution.t0 = 0.0
        self.solution.stop_reason = 'None'
        self.solution.computed_steps = 1
        self._ckpt_last_saved = None
        self._prepared = True

    # ------------------------------------------------------------------
    def _ensure_generator(self) -> FieldGenerator:
        """Jitter needs a sample stream even when U came from --Uinit-file
        or a checkpoint; build one from (generator, N, seed) unless a
        restored stream was installed after construction."""
        if self.generator is None:
            self.generator = FieldGenerator(
                self.params.generator, self.params.N, self.params.seed)
        return self.generator

    # --- field-layout helpers (identity unless cfg.fold_field) ---------
    def _field_natural(self, U_dev):
        """State-layout device field -> natural layout (the user view:
        solution.U, checkpoints, exports)."""
        if self.cfg.fold_field:
            return self._fold1_dev(U_dev)
        return U_dev

    def _field_state(self, U_nat):
        """Natural field -> state layout (checkpoint-restore path)."""
        U = jnp.asarray(U_nat, self.cfg.jdtype)
        if self.cfg.fold_field:
            return self._fold1_dev(U)
        return U

    def _draw_jitter_buf(self, k: int):
        if self._jitter_mode == 'stream':
            gen = self._ensure_generator()
            slabs = np.empty((self.chunk_size, self.params.N, self.params.N),
                             dtype=np.float64)
            for i in range(k):
                slabs[i] = gen.next_sample()
            if self.cfg.fold_field:
                # same slab values land on the same original cells
                from ..ops.dct import fold1_np
                slabs = fold1_np(slabs)
            return jnp.asarray(slabs, self.cfg.jdtype)
        if self._jitter_mode == 'static':
            if self._static_jbuf is None:
                buf = np.asarray(self._ensure_generator().next_sample())
                if self.cfg.fold_field:
                    from ..ops.dct import fold1_np
                    buf = fold1_np(buf)
                self._static_jbuf = jnp.asarray(buf, self.cfg.jdtype)
            return self._static_jbuf
        return self._null_jbuf

    def solve_or_resume(self, nsteps: Optional[int] = None) -> Solution:
        """Run (or continue) the simulation; returns the Solution."""
        assert self._prepared is True
        if nsteps is None:
            nsteps = max(self.params.ntmax, 0)

        # iteration-count semantics of solver.py:160-163
        if self.solution.computed_steps == 1:
            n_iters = max(nsteps - 1, 0)
        else:
            n_iters = nsteps

        state = self._state
        if self.cfg.jitter_mode == 'device_sobol':
            # draws consumed BEFORE step 1 (the initial field's N points
            # when this generator built U0; 0 after --Uinit-file).  The
            # host engine never advances in device mode, so its position
            # is exactly that base — restore-safe (the step computes its
            # own offset from computed_steps)
            gen = self._ensure_generator()
            base = int(gen._qrng.num_generated) if gen._qrng is not None \
                else 0
            self._consts = dict(self._consts,
                                sobol_base=jnp.asarray(base, jnp.uint32))
        # reference recomputes the spectral image at every (re)entry
        hat_U0 = self._dct2(state.U, self._consts)
        if self.cfg.spectral_bf16:
            hat_U0 = hat_U0.astype(jnp.bfloat16)
        state = state.replace(hat_U=hat_U0)
        if n_iters > 0:
            # reference parity: the loop does not check a previous stop —
            # re-entering after a stop continues the simulation
            # (solver.py:165 runs regardless of solution.stop_reason)
            state = state.replace(
                stop_reason=jnp.asarray(state_mod.STOP_NONE, jnp.int32))
            self.solution.stop_reason = 'None'

        every = self.params.checkpoint_every
        ckpt = self.params.checkpoint_file
        # the save cadence must survive re-entry: the live-view driver
        # calls solve_or_resume once per update_every slice, which is
        # usually far smaller than checkpoint_every
        if self._ckpt_last_saved is None:
            self._ckpt_last_saved = self.solution.computed_steps
        while n_iters > 0 and self.solution.stop_reason == 'None':
            k = min(n_iters, self.chunk_size)
            jbuf = self._draw_jitter_buf(k)
            state = self._run_chunk(state, jnp.asarray(k, jnp.int32),
                                    self._consts, jbuf)
            n_iters -= k
            state = self._sync(state)
            if (ckpt and every
                    and self.solution.computed_steps
                    - self._ckpt_last_saved >= every):
                # periodic resumable snapshot at the chunk boundary (the
                # device while_loop is opaque mid-chunk)
                self._state = state
                self.solution.U = self._field_natural(state.U)
                from ..checkpoint import save_checkpoint
                save_checkpoint(ckpt, self)
                self._ckpt_last_saved = self.solution.computed_steps

        self._state = state
        # keep U as the device array: pulling it to the host costs a full
        # field transfer (67 MB at N=4096 — seconds over a tunnel) and most
        # callers (benchmarks, chunked drivers) never read it.  NumPy
        # consumers convert implicitly via __array__ on first use.
        self.solution.U = self._field_natural(state.U)
        return self.solution

    def _sync(self, state: SolverState) -> SolverState:
        """Per-chunk host sync: pull rows, update host mirrors, map stop."""
        rows = int(state.rows)
        if rows > 0:
            block = np.asarray(state.rowbuf[:rows])
            try:
                self.solution.timedata.insert_block(block)
            except FloatingPointError:
                self.solution.stop_reason = 'nan'
                raise
        stop = int(state.stop_reason)
        if stop == STOP_NAN:
            self.solution.stop_reason = 'nan'
            raise FloatingPointError(
                "NaN encountered in timedata (step "
                f"{int(state.computed_steps)})")
        if stop != STOP_NONE:
            self.solution.stop_reason = STOP_STRINGS[stop]
        self.solution.computed_steps = int(state.computed_steps)
        self.solution.tau0 = float(state.tau0)
        self.solution.t0 = float(state.t0)
        self.skip_check = bool(state.skip_check)
        self.delt = float(state.delt)
        self.time_delta_sum = float(state.time_delta_sum)
        self.time_passed = self.time_delta_sum / self.params.M_tilde
        return state.replace(rows=jnp.asarray(0, jnp.int32))
