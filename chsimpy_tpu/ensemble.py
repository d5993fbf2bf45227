"""Vmapped Monte-Carlo ensemble solver.

The reference runs each UQ member as a separate OS process, one full
simulation per process (``chsimpy/experiment.py:84-126,197-216``).  Here the
ensemble is a *batch axis of one SPMD program*: every member shares the step
jaxpr; the perturbed physics scalars (A0, A1 and the kappa_tilde each pair
implies) are traced per-member values; a vmapped on-device while_loop gives
per-member early stopping; the member axis can be sharded over an 'ens' mesh
axis (DCN across hosts).

All members share the initial field (the reference re-uses the same seed for
every run, ``experiment.py:87-89``) unless per-member fields are passed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import material
from .core import state as state_mod
from .core import solver as solver_mod
from .core.solver import _JITTER_BUF_BYTES
from .core.state import STOP_NAN, STOP_NONE, STOP_STRINGS
from .core import stepper as stepper_mod
from .core.stepper import (CONSTS_BATCH_AXES, StepConfig, make_consts,
                           make_ensemble_prepare, make_ensemble_runner)
from .derived import Derived
from .ops import coeffs as coeffs_ops
from .ops import dct as dct_ops
from .params import Parameters
from .rng import FieldGenerator
from .solution import Solution
from .timedata import TimeData


def _warn_wide_f64_batch(R: int) -> bool:
    """Warn (and return False, keeping the unfolded route) for float64
    ozaki batches wider than 4 on real TPU — correct but ~20x slower
    than four-wide batches; the experiment driver clamps its width to 4
    automatically (experiment._resolve_batch_width)."""
    import warnings
    warnings.warn(
        f"float64 ozaki ensemble with R={R} > 4 on TPU: the chip "
        "backend miscompiles the batched folded transforms at width "
        ">= 8, so the (much slower) unfolded route is used.  Run "
        "four-wide batches instead (the experiment driver does this "
        "automatically).", RuntimeWarning, stacklevel=3)
    return False


def derive_member_constants(params: Parameters, A0: float, A1: float):
    """kappa_tilde implied by a member's (A0, A1) pair — the sympy
    common-tangent solve the reference performs per process
    (``chsimpy/solution.py:39-48``).  Host-side, cached by argument."""
    if params.kappa_tilde is not None:
        return params.kappa_tilde
    kappa_base = material.get_distance_common_tangent(
        R=params.R, T=params.temp, B=params.B, a0=A0, a1=A1, at=params.XXX)
    return kappa_base / (0.1602564 * 64) ** 2


class EnsembleSolver:
    """Batched Cahn-Hilliard integrator over UQ members.

    ``A_pairs`` is an (R, 2) array of (A0, A1) values (already perturbed).
    API mirrors Solver: ``prepare()`` then ``solve_or_resume(nsteps)``;
    results come back as one Solution per member via ``solutions()``.
    """

    def __init__(self, params: Parameters, A_pairs: np.ndarray,
                 U_init: Optional[np.ndarray] = None, mesh=None,
                 kappas: Optional[np.ndarray] = None):
        self.params = params
        A_pairs = np.asarray(A_pairs, dtype=np.float64)
        if A_pairs.ndim != 2 or A_pairs.shape[1] != 2:
            raise ValueError("A_pairs must be (R, 2)")
        self.R = A_pairs.shape[0]
        self.A0s = A_pairs[:, 0].copy()
        self.A1s = A_pairs[:, 1].copy()
        if kappas is not None:
            # precomputed member kappa_tildes (the experiment driver solves
            # the per-member sympy tangent in its host pool — 14.1 s serial
            # for the canonical R=16 batch); must be the values
            # derive_member_constants would return
            self.kappas = np.asarray(kappas, dtype=np.float64).copy()
            if self.kappas.shape != (self.R,):
                raise ValueError("kappas must be (R,)")
        else:
            self.kappas = np.array([
                derive_member_constants(params, a0, a1)
                for a0, a1 in zip(self.A0s, self.A1s)])
        self.mesh = mesh
        N = params.N

        # initial field: shared across members (reference semantics)
        self.generator = None
        if U_init is not None:
            U_init = np.asarray(U_init, dtype=np.float64)
            if U_init.shape != (N, N):
                raise ValueError(f"U_init has wrong shape {U_init.shape}")
            self.U_init = U_init
        else:
            self.generator = FieldGenerator(params.generator, N, params.seed)
            self.U_init = self.generator.initial_field(params.XXX)

        jitter_on = (params.jitter is not None
                     and 0.0 < params.jitter < 0.1)
        if jitter_on and params.generator == 'lcg':
            raise ValueError("jitter requires a sample stream; 'lcg' has none")
        _grid_devs = (mesh.shape.get('x', 1) * mesh.shape.get('y', 1)
                      if mesh is not None else 1)
        _grid_sharded = (_grid_devs > 1) or params.mesh_shape is not None
        fold_field = solver_mod.resolve_fold_field(
            params, grid_sharded=_grid_sharded)
        if fold_field:
            # same composition rules as the single-run solver: the fold is
            # a property of the split route's level-1 layout, and the seam
            # must stay member-local (ens-axis sharding is fine; grid
            # sharding of the member fields is not)
            if solver_mod.resolve_transform(params) != 'split':
                raise ValueError("--fold-field needs the split transform "
                                 "route (the fold is a property of its "
                                 "level-1 layout)")
            if params.kernel_backend != 'xla':
                raise ValueError("--fold-field requires --kernels xla "
                                 "(the Pallas stencils assume the natural "
                                 "layout)")
            if mesh is not None and (
                    mesh.shape.get('x', 1) * mesh.shape.get('y', 1) > 1):
                raise ValueError("--fold-field needs member-local fields: "
                                 "shard the ensemble over 'ens' only (the "
                                 "folded seam crosses grid-shard halves)")
        if jitter_on:
            jitter_mode = ('static' if params.generator == 'simplex'
                           else 'stream')
        else:
            jitter_mode = 'none'
        self._jitter_mode = jitter_mode

        time_limit = None
        if params.time_max is not None and params.time_max > 0:
            time_limit = params.time_max * 60.0

        # physics scalars shared across members come from the unperturbed
        # derivation (Am, delx, RT, ... do not depend on A0/A1)
        d = Derived.from_params(params)
        self.cfg = StepConfig(
            N=N, dtype=params.precision,
            RT=d.RT, BRT=d.BRT, B=params.B,
            Amr=d.Amr, L=params.L, delx=d.delx, delx2=d.delx2,
            M_tilde=params.M_tilde, threshold=params.threshold,
            A0=d.A0, A1=d.A1, kappa_tilde=d.kappa_tilde,
            delt_base=params.delt, delt_max=params.delt_max,
            adaptive_time=params.adaptive_time,
            time_limit=time_limit, full_sim=params.full_sim,
            jitter=params.jitter if jitter_on else None,
            jitter_mode=jitter_mode,
            kernel_backend=params.kernel_backend,
            transform_backend=solver_mod.resolve_transform(params),
            matmul_precision=params.matmul_precision or (
                'high' if params.precision == 'float32' else 'highest'),
            fwd_matmul_precision=solver_mod.resolve_fwd_matmul_precision(
                params),
            # banded inverse: honor an explicit --inv-band pin (vmapped
            # banding is just two batched matmuls per stage); the AUTO
            # gate stays single-run-only until measured under vmap
            inv_band=(solver_mod.resolve_inv_band(params)
                      if getattr(params, 'inv_band', None) else None),
            # same pin-only rule as inv_band: the per-step coefficient
            # rebuild composes with vmap (kappa is a batched scalar) but
            # the AUTO gate stays single-run until measured there
            otf_coeffs=(solver_mod.resolve_otf_coeffs(params)
                        if getattr(params, 'otf_coeffs', None) else False),
            # f64 on TPU: restructured stats keep the 1e-10 E contract
            # (verified by on-chip golden replay); CPU f64 keeps the
            # reference summation order (bit-level validation path).
            # fold_field requires the restructured reductions (only they
            # have fold-aware slicing), so it forces fast_stats
            fast_stats=(jax.default_backend() == 'tpu') or fold_field,
            fold_field=fold_field,
            split_levels=getattr(params, 'split_levels', None),
            # folded int8 blocks are member-local ops: they compose with
            # the vmapped batch and ens-axis sharding, but not with grid
            # sharding of the member fields (same rule as the solver).
            # R > 4 on real TPU additionally forces the UNFOLDED route:
            # at batch >= 8 the chip backend miscompiles the batched
            # folded/rfold forward transform when an inverse consumer is
            # fused into the same program (DC-scale 6.5e-3..1.1e-2
            # errors; each half alone is clean, barriers don't help —
            # scripts/probes/vmap_oz_b8_*.py, PERFORMANCE.md round 4).
            # The unfolded route measures exact at every batch width.
            ozaki_fold=(solver_mod.resolve_transform(params) == 'ozaki'
                        and not _grid_sharded and N % 2 == 0
                        and (self.R <= 4
                             or jax.default_backend() != 'tpu'
                             or _warn_wide_f64_batch(self.R))),
            ozaki_rfold_levels=(solver_mod._resolve_rfold_levels(
                params, grid_sharded=_grid_sharded)
                if (self.R <= 4 or jax.default_backend() != 'tpu')
                else 0),
            ozaki_fwd_pairs=solver_mod.resolve_ozaki_fwd_pairs(params),
            # inverse trim: pin-only under vmap — measured NEUTRAL there
            # (scripts/probes/ens_inv_trim.py: 1326 vs 1330 member-
            # steps/s at R=4 N=512; the four-wide batched int8 dots are
            # not pass-bound), so the conservative untrimmed default
            # costs nothing
            ozaki_inv_pairs=(tuple(params.ozaki_inv_pairs)
                             if getattr(params, 'ozaki_inv_pairs', None)
                             else None),
            # grid-sharded member fields under the split/ozaki routes use
            # the pencil layout (vmap adds the member axis to the pencil
            # specs automatically; 2 transpose all-to-alls per step)
            pencil=(_grid_sharded and N % _grid_devs == 0
                    and solver_mod.resolve_transform(params)
                    in ('split', 'ozaki')
                    and params.kernel_backend == 'xla'),
        )

        self.chunk_size = max(1, int(params.chunk_size))
        if jitter_mode == 'stream':
            per_step = N * N * 8
            self.chunk_size = max(
                1, min(self.chunk_size, _JITTER_BUF_BYTES // per_step))

        self._consts = self._build_consts()
        self._run = make_ensemble_runner(self.cfg, mesh=mesh)
        self._prepare = make_ensemble_prepare(self.cfg)
        dtype = self.cfg.jdtype
        self._null_jbuf = jnp.zeros((), dtype)
        # static jitter buffer is drawn lazily at first use: with an
        # explicit U_init there is no generator yet, and
        # checkpoint.restore_ensemble installs the saved stream *after*
        # construction
        self._static_jbuf = None
        # entry spectral recompute, built once (rebuilding per
        # solve_or_resume call retraces against the remote compile service)
        self._entry_dct2 = jax.jit(jax.vmap(
            stepper_mod.make_entry_dct2(self.cfg),
            in_axes=(0, CONSTS_BATCH_AXES)))
        self._states = None
        self.timedatas = [TimeData() for _ in range(self.R)]
        self._solutions = None
        self._replicate = None

    # ------------------------------------------------------------------
    def _build_consts(self):
        dtype = self.cfg.jdtype
        base = make_consts(self.cfg, self.params.delt)
        leig = base['leig']
        kts = jnp.asarray(self.kappas)

        def member_coeffs(leig, kt):
            CHeig, _ = coeffs_ops.get_coefficients(
                leig, kt.astype(dtype),
                jnp.asarray(self.params.delt, dtype), self.cfg.delx2)
            return CHeig.astype(dtype)

        # leig as argument, not closure: large HLO constants compile
        # pathologically slowly on the TPU compile service
        CHeig_b = jax.jit(jax.vmap(member_coeffs,
                                   in_axes=(None, 0)))(leig, kts)
        return {'C': base['C'], 'Cs': base['Cs'], 'CsT': base['CsT'],
                'leig': leig, 'tree': base['tree'],
                'CHeig': CHeig_b, 'Seig': base['Seig'],
                'A0': jnp.asarray(self.A0s),
                'A1': jnp.asarray(self.A1s),
                'kappa_tilde': kts,
                **{k: base[k] for k in ('eaxis', 'CeS', 'CoS', 'CeTS',
                                        'CoTS', 'sobol_sv', 'sobol_shift',
                                        'sobol_base', 'rf')}}

    def _shard(self, tree):
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        ens = NamedSharding(self.mesh, P('ens'))
        multi = jax.process_count() > 1

        def place(x):
            if hasattr(x, 'ndim') and x.ndim >= 1 and x.shape[0] == self.R:
                if multi:
                    # cross-process sharding: every process holds the full
                    # host value and contributes its addressable shards
                    xn = np.asarray(x)
                    return jax.make_array_from_callback(
                        xn.shape, ens, lambda idx: xn[idx])
                return jax.device_put(x, ens)
            return x
        return jax.tree_util.tree_map(place, tree)

    def _host_leaves(self, *leaves):
        """NumPy views of state leaves.  Under multi-process execution the
        leaves are sharded across processes, so replicate them first with a
        jitted identity (an all-gather over 'ens' on the backend)."""
        if self.mesh is not None and jax.process_count() > 1:
            if self._replicate is None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                rep = NamedSharding(self.mesh, P())
                self._replicate = jax.jit(lambda *t: t, out_shardings=rep)
            leaves = self._replicate(*leaves)
        return tuple(np.asarray(x) for x in leaves)

    # ------------------------------------------------------------------
    def prepare(self):
        dtype = self.cfg.jdtype
        U0 = jnp.asarray(self.U_init, dtype)
        U0_b = jnp.broadcast_to(U0, (self.R,) + U0.shape)
        # row-0 stats run on the natural layout (prepare_row0 takes the
        # EnergieEut=None reference path regardless of cfg.fold_field)
        E, E2, Ra, PS = self._prepare(self._consts, U0_b)
        E, E2, Ra, PS = (np.asarray(E), np.asarray(E2),
                         np.asarray(Ra), np.asarray(PS))

        if self.cfg.fold_field:
            # device state lives level-1 folded from here on; solutions()
            # and checkpoints present the natural view
            from .ops.dct import fold1_np
            U0_b = jnp.broadcast_to(
                jnp.asarray(fold1_np(self.U_init), dtype),
                (self.R,) + U0.shape)

        states = jax.vmap(
            lambda U, e2: state_mod.init_state(
                U, jnp.zeros_like(U), self.params.delt, e2,
                self.chunk_size, self.params.seed)
        )(U0_b, jnp.asarray(E2))
        # distinct buffers per leaf: vmap CSEs equal-valued leaves
        # (E2_first/E2_prev) into one buffer, which the donating runner
        # would otherwise receive twice
        states = jax.tree_util.tree_map(lambda x: x.copy(), states)
        self._states = self._shard(states)
        self._consts = self._shard(self._consts)

        self.timedatas = [TimeData() for _ in range(self.R)]
        for r in range(self.R):
            self.timedatas[r].insert(it=0, delt=self.params.delt, E=E[r],
                                     E2=E2[r], SA=0, domtime=0, Ra=Ra[r],
                                     L2=0, PS=PS[r])
        self._solutions = None
        self._stop = np.zeros(self.R, dtype=np.int64)

    # ------------------------------------------------------------------
    def _ensure_generator(self) -> FieldGenerator:
        """Jitter needs a sample stream even when U_init was passed
        explicitly (e.g. by checkpoint.restore_ensemble, which installs
        the saved stream after construction)."""
        if self.generator is None:
            self.generator = FieldGenerator(
                self.params.generator, self.params.N, self.params.seed)
        return self.generator

    def _draw_jitter_buf(self, k):
        if self._jitter_mode == 'stream':
            gen = self._ensure_generator()
            slabs = np.empty((self.chunk_size, self.params.N, self.params.N),
                             dtype=np.float64)
            for i in range(k):
                slabs[i] = gen.next_sample()
            if self.cfg.fold_field:
                # same slab values must land on the same original cells
                from .ops.dct import fold1_np
                slabs = fold1_np(slabs)
            return jnp.asarray(slabs, self.cfg.jdtype)
        if self._jitter_mode == 'static':
            if self._static_jbuf is None:
                buf = np.asarray(self._ensure_generator().next_sample())
                if self.cfg.fold_field:
                    from .ops.dct import fold1_np
                    buf = fold1_np(buf)
                self._static_jbuf = jnp.asarray(buf, self.cfg.jdtype)
            return self._static_jbuf
        return self._null_jbuf

    def solve_or_resume(self, nsteps: Optional[int] = None, on_chunk=None,
                        preserve_stops: bool = False):
        """Run up to ``nsteps`` (reference entry semantics).  ``on_chunk``,
        if given, is called as ``on_chunk(self, states)`` after every device
        chunk syncs — the hook behind the experiment driver's live view
        (cap ``chunk_size`` to control the refresh cadence).

        ``preserve_stops=True`` keeps already-stopped members stopped
        (the checkpoint-resume entry of the experiment driver: finishing
        an interrupted batch must not re-enter members whose early stop
        already fired).  Default False = reference re-entry parity
        (a new solve continues every member)."""
        assert self._states is not None, "call prepare() first"
        if nsteps is None:
            nsteps = max(self.params.ntmax, 0)
        computed, = self._host_leaves(self._states.computed_steps)
        # entry semantics (fresh solve runs nsteps-1 iterations, a resume
        # runs nsteps) are derived from member 0.  Per-member early stop
        # makes computed_steps legitimately diverge *above* 1, but a mix of
        # fresh (==1) and resumed (>1) members has no well-defined shared
        # iteration count — guard the invariant rather than assume it.
        fresh = computed == 1
        if fresh.any() and not fresh.all():
            raise AssertionError(
                "ensemble members disagree on entry semantics: "
                f"computed_steps={computed.tolist()} mixes fresh (==1) and "
                "resumed members; re-run prepare() or resume all members")
        n_iters = nsteps - 1 if int(computed[0]) == 1 else nsteps
        n_iters = max(n_iters, 0)

        states = self._states
        # reference recomputes the spectral image at every (re)entry
        # (transform operands as arguments — see member_coeffs note); same
        # transform route as the in-loop step
        states = states.replace(
            hat_U=self._entry_dct2(states.U, self._consts))
        if n_iters > 0 and not preserve_stops:
            # reference parity: re-entry after a stop continues each member
            states = states.replace(
                stop_reason=jnp.zeros_like(states.stop_reason))
            self._stop = np.zeros(self.R, dtype=np.int64)
        elif preserve_stops:
            self._stop, = self._host_leaves(states.stop_reason)
            self._stop = np.asarray(self._stop, dtype=np.int64)

        while n_iters > 0 and np.any(self._stop == STOP_NONE):
            k = min(n_iters, self.chunk_size)
            jbuf = self._draw_jitter_buf(k)
            states = self._run(states, jnp.asarray(k, jnp.int32),
                               self._consts, jbuf)
            n_iters -= k
            states = self._sync(states)
            # publish the fresh state BEFORE the hook: on_chunk consumers
            # (live view, the experiment driver's periodic checkpoints)
            # must see the solver as it is now, not one chunk stale
            self._states = states
            if on_chunk is not None:
                on_chunk(self, states)
        self._states = states
        return self.solutions()

    def _sync(self, states):
        rows, stops, bufs = self._host_leaves(
            states.rows, states.stop_reason, states.rowbuf)
        for r in range(self.R):
            if rows[r] > 0:
                self.timedatas[r].insert_block(bufs[r, :rows[r]])
            if stops[r] == STOP_NAN:
                raise FloatingPointError(
                    f"NaN in ensemble member {r}")
        self._stop = stops
        return states.replace(rows=jnp.zeros_like(states.rows))

    # ------------------------------------------------------------------
    def solutions(self) -> Sequence[Solution]:
        states = self._states
        Us, steps, tau0s, t0s, stops = self._host_leaves(
            states.U, states.computed_steps, states.tau0, states.t0,
            states.stop_reason)
        if self.cfg.fold_field:
            # device state is level-1 folded; present the natural view
            from .ops.dct import fold1_np
            Us = fold1_np(Us)
        sols = []
        for r in range(self.R):
            p = self.params.deepcopy()
            p.A0_const = float(self.A0s[r])
            p.A1_const = float(self.A1s[r])
            p.kappa_tilde = float(self.kappas[r])
            sol = Solution(p)
            sol.U = Us[r]
            sol.timedata = self.timedatas[r]
            sol.computed_steps = int(steps[r])
            sol.tau0 = float(tau0s[r])
            sol.t0 = float(t0s[r])
            sol.stop_reason = STOP_STRINGS[int(stops[r])]
            sols.append(sol)
        return sols
