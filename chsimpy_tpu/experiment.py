#!/usr/bin/env python
"""Monte-Carlo UQ experiment driver.

Mirrors the reference (``chsimpy/experiment.py``): perturbs the A0/A1
Redlich-Kister coefficients by factors in [0.995, 1.005] drawn from
uniform/sobol/grid/file sources (``experiment.py:148-190``), runs one full
simulation per (A0, A1) pair, post-processes each run (miscibility gap,
spinodal EPP roots, separation time) and aggregates to
``<id>-results.csv`` / ``<id>-results-agg.csv`` (``experiment.py:218-229``).

TPU-native execution: the runs are ONE vmapped SPMD program (EnsembleSolver)
instead of a process pool — the member axis shards over the devices/hosts of
an 'ens' mesh axis.  ``-P/--processes`` retains its meaning of "parallel
width": it caps how many members run per device batch (default: all).

The per-member HOST work — bz2 CSV export, PNG render, and the sympy
nsolve post-processing — is what the reference amortized inside its pool
workers (``experiment.py:84-126``).  Measured at N=512 it is ~1 s/member
(export 0.8 s + sympy 0.23 s) against ~0.12 s/member of device solve, so
the vmapped driver would be ~8x host-bound if it ran that pipeline
serially.  It therefore runs in a small spawn-based process pool
(:class:`HostPipeline`), overlapped with the next device batch;
``--host-procs`` sizes it (auto: one per CPU)."""

from __future__ import annotations

import numpy as np

from . import material, sysinfo
from .cli import CLIParser
from .ensemble import EnsembleSolver
from .io import csvio
from .solution import Solution


class ExperimentParams:
    def __init__(self):
        self.runs = 2
        self.jitter_Arellow = 0.995
        self.jitter_Arelhigh = 1.005
        self.processes = -1
        self.independent = False
        self.A_source = 'uniform'
        self.A_seed = None
        self.live_view = False
        self.host_procs = -1
        self.coordinator = None
        self.num_processes = None
        self.process_id = None


class ExperimentCLIParser:
    def __init__(self):
        self.cliparser = CLIParser('chsimpy-tpu (experiment)')
        group = self.cliparser.parser.add_argument_group('Experiment')
        group.add_argument('-R', '--runs', default=3, type=int,
                           help='Number of Monte-Carlo runs')
        group.add_argument('-P', '--processes', default=-1, type=int,
                           help='Parallel width: members per device batch '
                                '(-1 = all at once)')
        group.add_argument('--independent', action='store_true',
                           help='Independent A0, A1 runs, i.e. A0 and A1 do '
                                'not vary at the same time')
        group.add_argument('--A-source', default='uniform',
                           help="= ['uniform', 'sobol', 'grid', '<filename>']"
                                ' - Source for A0 x A1 numbers for the '
                                'Monte-Carlo runs (uniform or sobol random '
                                'numbers, evenly distributed grid points '
                                '[sqrt(runs) x sqrt(runs)], location of '
                                'text file with row-wise A0, A1 pairs)')
        group.add_argument('--A-seed', default=85972, type=int,
                           help='RNG seed for generating random A0, A1 '
                                '(if --A-source is not file-based)')
        group.add_argument('--host-procs', default=-1, type=int,
                           help='Worker processes for the per-member host '
                                'pipeline (CSV/YAML export, PNG render, '
                                'sympy post-processing), overlapped with '
                                'the device solve. -1 = one per CPU, '
                                '0/1 = synchronous')
        group.add_argument('--coordinator', default=None,
                           help='jax.distributed coordinator address '
                                '(host:port): run the experiment as one '
                                'process of a multi-process ensemble — the '
                                "'ens' mesh axis spans every process's "
                                'devices, per-member host pipelines run on '
                                'the owning process (reference: its only '
                                'multi-process surface is the experiment '
                                'pool, chsimpy/experiment.py:197-216). '
                                'Launch recipe: docs/DISTRIBUTED.md')
        group.add_argument('--num-processes', default=None, type=int,
                           help='Total process count of the distributed '
                                'experiment (with --coordinator)')
        group.add_argument('--process-id', default=None, type=int,
                           help='This process\'s rank in [0, '
                                '--num-processes) (with --coordinator)')
        group.add_argument('--live-view', action='store_true',
                           help='Live map of ensemble member 0, refreshed '
                                'about every --update-every steps (beyond-'
                                'reference: the reference forces no-gui in '
                                'experiments)')

    def get_parameters(self, argv=None):
        params = self.cliparser.get_parameters(argv)
        exp_params = ExperimentParams()
        args = self.cliparser.args
        exp_params.runs = args.runs
        exp_params.independent = args.independent
        exp_params.A_source = args.A_source
        params.no_gui = True
        params.yaml = True
        if args.export_csv is None:
            params.export_csv = 'U, E, E2, SA'
            params.compress_csv = True
        else:
            params.export_csv = args.export_csv
            params.compress_csv = args.compress_csv
        if exp_params.runs < 1:
            self.cliparser.parser.error('ERROR: --runs must be at least 1.')
        if params.png_anim:
            self.cliparser.parser.error('ERROR: --png-anim is not allowed.')
        exp_params.processes = args.processes
        exp_params.A_seed = args.A_seed
        exp_params.live_view = args.live_view
        exp_params.host_procs = args.host_procs
        exp_params.coordinator = args.coordinator
        exp_params.num_processes = args.num_processes
        exp_params.process_id = args.process_id
        if exp_params.live_view and params.update_every is None:
            self.cliparser.parser.error(
                'ERROR: --live-view requires --update-every.')
        if exp_params.coordinator is not None:
            if exp_params.num_processes is None \
                    or exp_params.process_id is None:
                self.cliparser.parser.error(
                    'ERROR: --coordinator requires --num-processes and '
                    '--process-id.')
            if exp_params.live_view:
                self.cliparser.parser.error(
                    'ERROR: --live-view is single-process only.')
            if params.checkpoint_file or params.restore_file:
                self.cliparser.parser.error(
                    'ERROR: experiment checkpointing is single-process '
                    'only (the checkpoint header would need a global '
                    'result gather at every save).')
            if params.file_id is None or params.file_id == 'auto':
                self.cliparser.parser.error(
                    'ERROR: distributed experiments need an explicit '
                    '--file-id (auto ids are timestamps; the processes '
                    'would disagree).')
        return exp_params, params


def generate_A_factors(exp_params: ExperimentParams) -> np.ndarray:
    """(n_items, 2) matrix of multiplicative A0/A1 factors — the exact
    uniform/sobol/grid constructions of ``experiment.py:148-188``
    (bit-compatible streams)."""
    lo, hi = exp_params.jitter_Arellow, exp_params.jitter_Arelhigh
    runs = exp_params.runs
    src = exp_params.A_source
    if src in ('uniform', 'sobol'):
        if src == 'sobol':
            from scipy.stats import qmc
            qrng = qmc.Sobol(d=2, seed=exp_params.A_seed)
            m = int(np.ceil(np.log2(runs))) if runs > 1 else 0
            rtemp = qrng.random_base2(m)
            rtemp = qmc.scale(rtemp, lo, hi)
            rtemp = np.transpose(rtemp[:runs])
        else:
            rng = np.random.Generator(np.random.PCG64(exp_params.A_seed))
            rtemp = rng.uniform(lo, hi, size=(runs, 2))
            rtemp = np.transpose(rtemp)
        if exp_params.independent:
            rand_values = np.ones((2 * runs, 2))
            rand_values[:runs, 0] = rtemp[0]
            rand_values[runs:, 1] = rtemp[1]
        else:
            rand_values = np.ones((runs, 2))
            rand_values[:runs, 0] = rtemp[0]
            rand_values[:runs, 1] = rtemp[1]
        return rand_values
    if src == 'grid':
        nx = int(np.floor(np.sqrt(runs)))
        exp_params.runs = nx * nx
        xvec = np.linspace(lo, hi, nx)
        if exp_params.independent:
            rand_values = np.ones((2 * nx, 2))
            rand_values[:nx, 0] = xvec
            rand_values[nx:, 1] = xvec
        else:
            pts = [[v, w] for v in xvec for w in xvec]
            rand_values = np.asarray(pts, dtype=np.float64)
        return rand_values
    raise ValueError(f"not a generated source: {src}")


def a_plan_digest(A_pairs, facs) -> str:
    """Fingerprint of the experiment's A-plan — the realized (A0, A1)
    pairs plus their factor rows.  Hashing the matrices (rather than the
    generating flags) covers every input that shapes them: A-source,
    A-seed, jitter_Arel bounds, --independent, temperature, and the
    A0/A1 base fits.  Stored in experiment checkpoints so a resume with
    a different plan cannot silently mix two UQ designs in one
    results.csv."""
    import hashlib
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(A_pairs, dtype=np.float64).tobytes())
    h.update(np.ascontiguousarray(facs, dtype=np.float64).tobytes())
    return h.hexdigest()


def postprocess_member(params, sol: Solution, run_id, fac_A0, fac_A1):
    """Per-run sympy post-processing (``experiment.py:110-126``)."""
    cgap = material.get_miscibility_gap(params.R, params.temp, params.B,
                                        sol.A0, sol.A1)
    sa, sb = material.get_roots_of_EPP(params.R, params.temp,
                                       sol.A0, sol.A1)
    itargmax = int(np.argmax(sol.E2))
    return (sol.A0, sol.A1, cgap[0], cgap[1], sa, sb,
            sol.tau0, sol.t0, itargmax, run_id, fac_A0, fac_A1)


def export_member(params, sol: Solution, file_id: str):
    """Per-run yaml/csv export with reference-compatible names."""
    fname_sol = f"{file_id}.solution"
    if params.yaml:
        sol.yaml_export_scalars(fname=fname_sol + '.yaml')
    if params.export_csv is not None:
        fext = 'csv.bz2' if params.compress_csv else 'csv'
        for member in params.export_csv.replace(' ', '').split(','):
            varray = getattr(sol, member, None)
            if varray is not None and getattr(varray, 'ndim', 0) >= 1:
                csvio.csv_export_matrix(np.asarray(varray),
                                        fname=f"{fname_sol}.{member}.{fext}")


def render_member(params, sol: Solution, file_id: str):
    """Per-run PNG render when ``--png`` is set (the reference renders every
    experiment run, ``chsimpy/experiment.py:104-109``)."""
    if not params.png:
        return
    from .simulator import render_solution_png
    render_solution_png(params, sol, f"{file_id}.png")


def _host_pool_init():
    """Worker initializer: pin any accidental jax use to the CPU backend.

    Workers only run numpy/sympy/pandas/matplotlib code, so jax's backend
    stays uninitialized — but a TPU tunnel admits a single client process,
    so a stray device op in a worker must never reach for it (the config
    API wins over the JAX_PLATFORMS env var here).  The marker env var
    lets :func:`run_experiment_batch` refuse recursive entry: a spawn
    worker re-imports the user's __main__ script, and an UNGUARDED
    experiment script (no ``if __name__ == '__main__'``) would otherwise
    silently re-run the whole experiment — device solve included — in
    every worker."""
    import os
    os.environ['CHSIMPY_TPU_HOST_WORKER'] = '1'
    try:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    except Exception:
        pass


def _host_pool_warmup():
    """No-op task that front-loads the worker's heavy imports.

    A spawn worker pays its numpy/pandas/sympy/matplotlib imports on its
    FIRST task; submitted at pool construction, those imports overlap
    the device solve instead of serializing after it (measured ~1-2 s
    per worker on the canonical R=16 profile,
    scripts/probes/uq_smallr_profile.py)."""
    import pandas  # noqa: F401  (csv export path)

    from . import material  # noqa: F401  (sympy postprocessing)
    from .io import csvio  # noqa: F401
    return None


def _host_member_task(rp, sol, run_id, fac_A0, fac_A1):
    """The per-member host pipeline: export + render + sympy postproc.

    This is the work the reference does inside each pool worker
    (``chsimpy/experiment.py:104-126``); everything it touches is plain
    numpy/sympy/matplotlib, no device state."""
    export_member(rp, sol, rp.file_id)
    render_member(rp, sol, rp.file_id)
    return postprocess_member(rp, sol, run_id, fac_A0, fac_A1)


class HostPipeline:
    """Parallel per-member host pipeline, overlapped with the device solve.

    Submissions run in a spawn-based process pool (payloads are plain
    Parameters + host-materialized Solutions — both picklable); with
    ``procs <= 1`` everything degrades to synchronous in-process calls.
    ``drain()`` blocks until every submitted member is finished and
    returns the accumulated result rows in submission order — call it
    before anything that must see a complete result set (checkpoint
    headers, the final aggregation)."""

    def __init__(self, procs=-1, seed_rows=()):
        self.rows = [tuple(r) for r in seed_rows]
        self._futs = []
        self._pool = None
        if procs is None or procs < 0:
            import os
            procs = os.cpu_count() or 1
        if procs > 1:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor
            self._pool = ProcessPoolExecutor(
                max_workers=procs, mp_context=mp.get_context('spawn'),
                initializer=_host_pool_init)
            # spawn + import the workers NOW (overlapped with the device
            # solve) instead of on the first post-solve submit; results
            # are discarded, failures surface on the first real drain
            for _ in range(procs):
                self._pool.submit(_host_pool_warmup)

    def submit(self, rp, sol, run_id, fac_A0, fac_A1, on_done=None):
        if self._pool is None:
            self.rows.append(_host_member_task(rp, sol, run_id,
                                               fac_A0, fac_A1))
            if on_done is not None:
                on_done()
            return
        fut = self._pool.submit(_host_member_task, rp, sol, run_id,
                                fac_A0, fac_A1)
        if on_done is not None:
            fut.add_done_callback(lambda _f: on_done())
        self._futs.append(fut)

    def drain(self):
        """Wait for all in-flight members; rows stay in submission order."""
        for fut in self._futs:
            self.rows.append(fut.result())
        self._futs.clear()
        return self.rows

    def map(self, fn, items):
        """Pool-map side work (e.g. the per-member sympy kappa solves)
        through the same workers; synchronous when the pool is off."""
        items = list(items)
        if self._pool is None or len(items) < 2:
            return [fn(x) for x in items]
        return list(self._pool.map(fn, items))

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=True)
            self._pool = None


def _member_kappa_task(args):
    """One member's kappa_tilde from its (A0, A1) pair — the pool-friendly
    form of :func:`chsimpy_tpu.ensemble.derive_member_constants` (sympy
    common tangent, reference ``chsimpy/solution.py:39-48``)."""
    from .ensemble import derive_member_constants
    params, a0, a1 = args
    return derive_member_constants(params, a0, a1)


def _member_kappas(init_params, A_sub, sink):
    """kappa_tilde per member of one batch, through the host pool.

    The tangent solve is ~0.9 s/member serial (14.1 s of the canonical
    R=16 experiment's 40.8 s wall); unique pairs are solved once."""
    if init_params.kappa_tilde is not None:
        return np.full(A_sub.shape[0], float(init_params.kappa_tilde))
    uniq = list(dict.fromkeys((float(a0), float(a1)) for a0, a1 in A_sub))
    vals = sink.map(_member_kappa_task,
                    [(init_params, a0, a1) for a0, a1 in uniq])
    table = dict(zip(uniq, vals))
    return np.array([table[(float(a0), float(a1))] for a0, a1 in A_sub])


def _auto_batch_width(nr_items, exp_params, mesh):
    """Device batch width when -P is auto (-1).

    Default is everything at once, EXCEPT: a single-batch run serializes
    ALL its host work (export/render/sympy, ~1.4 s/member of mandatory
    CPU time) after the solve, so with the host pipeline on and >= 8
    members the run splits in two — batch 1's host pipeline hides
    behind batch 2's device solve.  Measured on chip (R=16 sobol N=512
    f32): 18.5 -> 16.6 s end-to-end; splitting four ways regresses
    (17.8 s, per-batch ctor/prepare overhead); R=64 is neutral-to-better
    (40-41.6 vs 42.4 s).  Explicit -P keeps full control (and old
    checkpoint widths).  Under a device mesh the width maps to the 'ens'
    axis, so auto stays single-batch there."""
    hp = getattr(exp_params, 'host_procs', -1)
    if (nr_items >= 8 and mesh is None
            and (hp is None or hp < 0 or hp > 1)):
        return (nr_items + 1) // 2
    return nr_items


def _resolve_batch_width(width, init_params):
    """Clamp the device batch width where measurement says so.

    float64 ozaki ensembles on real TPU run four-wide: at batch >= 8 the
    chip backend both MISCOMPILES the batched folded transforms
    (DC-scale errors -> NaN; EnsembleSolver falls back to the unfolded
    route there) and serializes the batched int8 dots (5.84 vs 1.10
    ms/member at the width-4 optimum — scripts/probes/
    vmap_unfold_speed.py).  Four sequential width-4 batches measure
    1318 member-steps/s vs 180 for one width-16 batch."""
    import jax

    from .core.solver import resolve_transform
    if (width > 4 and init_params.precision == 'float64'
            and jax.default_backend() == 'tpu'
            and resolve_transform(init_params) == 'ozaki'):
        print('note: float64 ozaki ensembles run four-wide device '
              'batches (measured optimum; see PERFORMANCE.md round 4)')
        return 4
    return width


def _merge_rows_across_processes(rows, nr_items):
    """Gather per-process result rows into the global run-ordered set.

    Under multi-process execution every process post-processes only the
    members it owns (``run_id % process_count == process_index``); the
    results table needs all of them (the reference's pool gathers rows
    into the parent, ``chsimpy/experiment.py:211-218``).  Rows are
    fixed-width numeric tuples, so they ride one float64
    ``process_allgather`` over the distributed runtime; padding rows are
    NaN in the id column.  tsep/id are restored to ints so the merged
    ``results.csv`` stays byte-identical to a single-process run's."""
    import jax
    from jax.experimental import multihost_utils
    ncols = 12
    maxm = -(-nr_items // jax.process_count())
    buf = np.full((maxm, ncols), np.nan)
    for i, r in enumerate(rows):
        buf[i] = [np.nan if v is None else float(v) for v in r]
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(-1, ncols)
    gathered = gathered[~np.isnan(gathered[:, 9])]  # drop the padding
    gathered = gathered[np.argsort(gathered[:, 9], kind='stable')]
    out = []
    for r in gathered:
        row = [None if np.isnan(v) else float(v) for v in r]
        row[8] = int(row[8])   # tsep
        row[9] = int(row[9])   # id
        out.append(tuple(row))
    return out


def run_experiment_batch(init_params, exp_params, A_list=None, U_init=None,
                         mesh=None, progress=True):
    """Run the full ensemble; returns (results rows, file_id)."""
    import os
    if os.environ.get('CHSIMPY_TPU_HOST_WORKER'):
        raise RuntimeError(
            "run_experiment_batch called inside a host-pipeline worker: "
            "the experiment script was re-imported by the spawn pool. "
            "Guard the script's entry point with if __name__ == "
            "'__main__' (or pass --host-procs 1 to disable the pool).")
    if A_list is None:
        rand_values = generate_A_factors(exp_params)
        A0_base = init_params.func_A0(init_params.temp)
        A1_base = init_params.func_A1(init_params.temp)
        A_pairs = np.stack([rand_values[:, 0] * A0_base,
                            rand_values[:, 1] * A1_base], axis=1)
        facs = rand_values
    else:
        # reference caps file-sourced runs at --runs (experiment.py:205-209)
        A_pairs = np.asarray(A_list, dtype=np.float64)[:exp_params.runs]
        facs = np.full_like(A_pairs, np.nan)

    nr_items = A_pairs.shape[0]
    plan_digest = a_plan_digest(A_pairs, facs)
    width = exp_params.processes
    if width is None or width <= 0:
        width = _auto_batch_width(nr_items, exp_params, mesh)
    width = _resolve_batch_width(width, init_params)

    import jax
    pcount = jax.process_count()
    if pcount > 1:
        if init_params.checkpoint_file or init_params.restore_file:
            raise ValueError(
                'experiment checkpoint/restore is single-process only '
                '(the checkpoint header needs a global result gather at '
                'every save)')
        if getattr(exp_params, 'live_view', False):
            raise ValueError('live_view is single-process only')
        if mesh is None:
            raise ValueError(
                'multi-process experiments need a global device mesh '
                "(an 'ens' axis spanning every process's devices)")

    seed_rows = []
    file_id = init_params.file_id

    # --- checkpoint/resume of the experiment itself (long UQ runs):
    # periodic per-batch ensemble snapshots carry the experiment progress
    # (completed-result rows + batch cursor) in the header, so --restore
    # skips finished batches and finishes the interrupted one in place
    # (already-stopped members stay stopped: preserve_stops)
    ckpt_file = init_params.checkpoint_file
    ckpt_every = init_params.checkpoint_every
    resume_start = 0
    resumed_ens = None
    if init_params.restore_file:
        from .checkpoint import restore_ensemble
        resumed_ens = restore_ensemble(init_params.restore_file, mesh=mesh)
        extra = getattr(resumed_ens, '_ckpt_extra', None) or {}
        if extra.get('kind') != 'experiment':
            raise ValueError(
                f"{init_params.restore_file} is not an experiment "
                "checkpoint (solver checkpoints resume via the "
                "single-run CLI)")
        if extra['nr_items'] != nr_items or extra['width'] != width:
            raise ValueError(
                "experiment restore needs the same run plan: the "
                f"checkpoint has {extra['nr_items']} runs / width "
                f"{extra['width']}, this command line gives "
                f"{nr_items} / {width}")
        if extra.get('A_plan') != plan_digest:
            raise ValueError(
                "experiment restore needs the same A-plan: the "
                "checkpoint's A0/A1 factor matrix differs from the one "
                "this command line generates (check --A-source, "
                "--A-seed, the jitter-Arel bounds, --independent, and "
                "the temperature/A-fits)")
        seed_rows = [tuple(r) for r in extra['results']]
        resume_start = int(extra['start'])

    sink = HostPipeline(getattr(exp_params, 'host_procs', -1),
                        seed_rows=seed_rows)

    def _json_rows(rows):
        # integers (tsep, run ids) must survive the JSON round-trip as
        # integers: a resumed experiment's results.csv is byte-identical
        # to an uninterrupted run's (crash_resume_demo.py)
        def conv(v):
            if v is None:
                return None
            if isinstance(v, (int, np.integer)):
                return int(v)
            return float(v)
        return [[conv(v) for v in r] for r in rows]

    view = None
    on_chunk = None
    if getattr(exp_params, 'live_view', False):
        if not init_params.update_every:
            raise ValueError("live_view requires update_every (the CLI "
                             "enforces this; programmatic callers too)")
        from .viz.mapview import MapView
        view = MapView(init_params.N)
        view.prepare(show=True)
        view.imode_on()
        view.show()
        # preview at <=512 px a side: the full field is a multi-MB
        # device->host pull per refresh over the slow tunnel
        stride = max(1, init_params.N // 512)
        _unfold_cache = {}

        def _unfold_for(ens):
            # decide from the solver's RESOLVED config (fold_field=None is
            # auto-resolved at EnsembleSolver construction)
            if not ens.cfg.fold_field:
                return None
            if 'fn' not in _unfold_cache:
                import jax as _jax

                from .ops.dct import fold1
                _unfold_cache['fn'] = _jax.jit(fold1)  # involution
            return _unfold_cache['fn']

        def on_chunk(ens, states):
            U0dev = states.U[0]
            _unfold = _unfold_for(ens)
            if _unfold is not None:
                # device state is level-1 folded; unfold on device so the
                # host pull stays the strided preview size
                U0dev = _unfold(U0dev)
            U0 = np.asarray(U0dev[::stride, ::stride])
            step = int(np.asarray(states.computed_steps[0]))
            view.set_Umap(U0, init_params.threshold,
                          title=f"member 0 | step {step}")
            view.draw()

    pbar = None
    if progress:
        try:
            # per-RUN ticks with a memory postfix, like the reference's
            # imap_unordered progress (experiment.py:211-216): each member
            # ticks as its export/postprocessing completes
            from tqdm import tqdm
            owned = (nr_items if pcount == 1 else
                     len(range(jax.process_index(), nr_items, pcount)))
            pbar = tqdm(total=owned, desc='ensemble runs')
        except ImportError:
            pass
    try:
        results = _run_batches(
            init_params, sink, A_pairs, facs, A_list, U_init,
            mesh, nr_items, width, resume_start, resumed_ens, plan_digest,
            file_id, ckpt_file, ckpt_every, on_chunk, view, pbar,
            _json_rows)
    finally:
        sink.close()
    if pbar is not None:
        pbar.close()
    if view is not None:
        view.finish()
    if pcount > 1:
        results = _merge_rows_across_processes(results, nr_items)
    return results


def _run_batches(init_params, sink, A_pairs, facs, A_list,
                 U_init, mesh, nr_items, width, resume_start, resumed_ens,
                 plan_digest, file_id, ckpt_file, ckpt_every, on_chunk,
                 view, pbar, _json_rows):
    """Device-batch loop of :func:`run_experiment_batch`: solve each vmapped
    batch, hand every finished member to the host pipeline ``sink``."""
    import jax
    pcount = jax.process_count()
    pindex = jax.process_index()
    for start in range(0, nr_items, width):
        stop = min(start + width, nr_items)
        if start + width <= resume_start:
            # batch finished before the checkpoint: rows recovered from
            # the header, per-run files already on disk
            if pbar is not None:
                pbar.update(stop - start)
            continue

        hook = on_chunk
        if ckpt_file and ckpt_every:
            last_saved = [0]

            def hook(ens_, states, _start=start, _prev=on_chunk,
                     _last=last_saved):
                if _prev is not None:
                    _prev(ens_, states)
                c = int(np.max(ens_._host_leaves(states.computed_steps)[0]))
                if c - _last[0] >= ckpt_every:
                    from .checkpoint import save_ensemble_checkpoint
                    # the header must carry a COMPLETE result set for the
                    # batches before _start: wait out any still-running
                    # host-pipeline members (they are from earlier batches)
                    save_ensemble_checkpoint(
                        ckpt_file, ens_, extra_header={
                            'kind': 'experiment',
                            'nr_items': nr_items, 'width': width,
                            'A_plan': plan_digest, 'start': _start,
                            'results': _json_rows(sink.drain())})
                    _last[0] = c

        if start == resume_start and resumed_ens is not None:
            # finish the interrupted batch in place
            ens = resumed_ens
            if view is not None:
                ens.chunk_size = max(1, min(ens.chunk_size,
                                            init_params.update_every))
            c0 = int(np.max(ens._host_leaves(ens._states.computed_steps)[0]))
            remaining = max(init_params.ntmax - c0, 0)
            sols = ens.solve_or_resume(remaining, on_chunk=hook,
                                       preserve_stops=True)
        else:
            batch_params = init_params.deepcopy()
            kappas = _member_kappas(init_params, A_pairs[start:stop], sink)
            ens = EnsembleSolver(batch_params, A_pairs[start:stop],
                                 U_init=U_init, mesh=mesh, kappas=kappas)
            if view is not None:
                # refresh the view about every --update-every steps
                ens.chunk_size = max(1, min(ens.chunk_size,
                                            init_params.update_every))
            ens.prepare()
            sols = ens.solve_or_resume(init_params.ntmax, on_chunk=hook)
        on_done = None
        if pbar is not None:
            def on_done():
                # memory readout per tick (reference experiment.py:212-214);
                # ticks fire as each member's host pipeline completes, like
                # the reference's imap_unordered progress
                pbar.set_postfix({'Mem': sysinfo.get_mem_usage_all()},
                                 refresh=False)
                pbar.update(1)
        for i, sol in enumerate(sols):
            run_id = start + i
            if pcount > 1 and run_id % pcount != pindex:
                # another process owns this member's host pipeline (its
                # rows arrive via the final process_allgather merge)
                continue
            rp = init_params.deepcopy()
            rp.file_id = f"{file_id}-run{run_id}"
            fac0 = None if A_list is not None else facs[run_id, 0]
            fac1 = None if A_list is not None else facs[run_id, 1]
            # sol is host-materialized (EnsembleSolver.solutions pulls the
            # device leaves); the submit overlaps this member's export/
            # render/sympy work with the NEXT device batch
            sink.submit(rp, sol, run_id, fac0, fac1, on_done=on_done)
    return sink.drain()


def aggregate_results(results, file_id):
    """results.csv + describe()/cv aggregation (``experiment.py:218-229``)."""
    import pandas as pd
    cols = ['A0', 'A1', 'ca', 'cb', 'sa', 'sb', 'tau0', 't0', 'tsep',
            'id', 'fac_A0', 'fac_A1']
    df_results = pd.DataFrame(results, columns=cols)
    df_results[['tau0', 'id']] = df_results[['tau0', 'id']].astype(int)
    df_results.to_csv(f"{file_id}-results.csv")
    df_agg = df_results.loc[:, df_results.columns != 'id'].describe()
    df_agg.loc['cv'] = df_agg.loc['std'] / df_agg.loc['mean']
    df_agg.T.to_csv(f"{file_id}-results-agg.csv")
    return df_results, df_agg


def _distributed_mesh(exp_params, init_params):
    """Initialize ``jax.distributed`` from the experiment CLI flags and
    return the global ('ens','x','y') mesh the batches shard over: the
    'ens' axis spans every process's devices (the reference's pool axis,
    ``chsimpy/experiment.py:211``), with ``--mesh`` (if given) carving a
    per-member ('x','y') grid out of each member's share."""
    import jax

    from .parallel import distributed
    from .parallel.mesh import make_ensemble_mesh
    topo = distributed.initialize(
        coordinator_address=exp_params.coordinator,
        num_processes=exp_params.num_processes,
        process_id=exp_params.process_id)
    grid = tuple(init_params.mesh_shape or (1, 1))
    n_grid = int(np.prod(grid))
    n_dev = topo['global_devices']
    if n_dev % n_grid:
        raise ValueError(f"--mesh {grid} does not divide the "
                         f"{n_dev} global devices")
    return make_ensemble_mesh(n_dev // n_grid, grid)


def main(argv=None):
    import threading

    import chsimpy_tpu as _ct
    _ct.honor_jax_platforms_env()
    # scipy.stats costs ~2 s of pure import (the sobol A-source needs
    # qmc); start it on a daemon thread so it overlaps CLI parsing,
    # sysinfo capture and backend init (generate_A_factors blocks on the
    # module lock only for whatever remains)
    threading.Thread(target=lambda: __import__('scipy.stats'),
                     daemon=True).start()
    exp_cliparser = ExperimentCLIParser()
    exp_cliparser.cliparser.print_info()
    exp_params, init_params = exp_cliparser.get_parameters(argv)

    mesh = None
    if exp_params.coordinator is not None:
        mesh = _distributed_mesh(exp_params, init_params)
    import jax
    is_primary = jax.process_index() == 0
    if is_primary:
        print(str(init_params).replace(", '", "\n '"))

    if init_params.file_id is None or init_params.file_id == 'auto':
        init_params.file_id = sysinfo.get_or_create_file_id(
            init_params.file_id)
    sysinfo_list = sysinfo.get_system_info()

    U_init = None
    if init_params.Uinit_file is not None:
        U_init = csvio.csv_import_matrix(init_params.Uinit_file)

    A_list = None
    if exp_params.A_source not in ('uniform', 'sobol', 'grid'):
        A_list = csvio.csv_import_matrix(exp_params.A_source)

    if is_primary:
        exp_params_list = sysinfo.vars_to_list(exp_params)
        csvio.csv_export_list(f"{init_params.file_id}-metadata.csv",
                              "\n".join(sysinfo_list + exp_params_list))

    results = run_experiment_batch(init_params, exp_params,
                                   A_list=A_list, U_init=U_init,
                                   mesh=mesh, progress=is_primary)
    if not is_primary:
        # every process holds the merged rows; one writes the tables
        return
    df_results, df_agg = aggregate_results(results, init_params.file_id)
    print(df_agg.T)
    print('Output files:')
    print(f"  {init_params.file_id}-metadata.csv")
    print(f"  {init_params.file_id}-results-agg.csv")
    print(f"  {init_params.file_id}-results.csv")
    print(f"  {{{init_params.file_id}-run***.solution.yaml}}")
    print(f"  {{{init_params.file_id}-run***.solution.*.(csv|bz2)}}")
    if init_params.png:
        print(f"  {{{init_params.file_id}-run***.png}}")


if __name__ == '__main__':
    main()
