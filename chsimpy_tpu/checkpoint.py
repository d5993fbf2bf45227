"""On-disk checkpoint / resume.

The reference's only cross-process resume is ``--Uinit-file`` (reload a
previously exported U matrix, which restarts the time series,
``chsimpy/simulator.py:21-22``).  Long pod runs need a real checkpoint: the
full solver state — U, the timedata series, step/time counters, delt,
early-stop bookkeeping, and the host RNG stream position — so a resumed run
continues the exact trajectory: bit-for-bit with a run that passed a
solve-entry boundary at the same step (the reference recomputes the
spectral image from U at every ``solve_or_resume`` entry,
``chsimpy/solver.py:159`` — a checkpoint boundary is exactly such an
entry, so resume == in-memory re-entry).

Format: a single ``.npz`` with a JSON-encoded scalar header.  Ensemble
runs have their own pair (:func:`save_ensemble_checkpoint` /
:func:`restore_ensemble`) covering every member + the shared stream.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

# v2: the host generator stream position is structured JSON in the header
# (FieldGenerator.state_dict) instead of a pickle blob — restoring a
# checkpoint must never execute code from the file.
FORMAT_VERSION = 2


def _atomic_savez(fname: str, **arrays) -> None:
    """Crash-safe ``np.savez_compressed``: a SIGKILL / OOM-kill /
    preemption mid-write must never corrupt (or half-overwrite) the
    previous checkpoint — that is the exact failure checkpoints exist
    for.  Writes to a temp file in the target's directory, fsyncs, then
    atomically renames over the target (POSIX).  Writing through an
    open file object also stops numpy silently appending '.npz' to
    extensionless names (``--checkpoint-file run.ckpt`` used to produce
    ``run.ckpt.npz`` that ``--restore run.ckpt`` could not find)."""
    fname = os.fspath(fname)
    d = os.path.dirname(os.path.abspath(fname)) or '.'
    fd, tmp = tempfile.mkstemp(dir=d,
                               prefix=os.path.basename(fname) + '.tmp.')
    try:
        with os.fdopen(fd, 'wb') as f:
            np.savez_compressed(f, **arrays)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, fname)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _params_from_header(header: dict):
    """Parameters from a checkpoint header, validated against THIS build's
    mode choices: a checkpoint from a build whose mode was since deleted
    (e.g. round-2's kernel_backend='pallas-fused') must fail loudly, not
    silently restore onto a different compute path."""
    from .params import Parameters
    params = Parameters()
    names = {f.name for f in params.__dataclass_fields__.values()}
    for k, v in header['params'].items():
        if k in names and k != 'version':
            if k == 'mesh_shape' and v is not None:
                v = tuple(v)
            setattr(params, k, v)
    kb = getattr(params, 'kernel_backend', 'xla')
    if kb not in ('xla', 'pallas'):
        raise ValueError(
            f"checkpoint requests kernel_backend={kb!r}, which this build "
            "does not provide (choices: xla, pallas; 'pallas-fused' was "
            "removed in round 3 — restore under --kernels xla needs a "
            "checkpoint saved with a supported mode)")
    tb = getattr(params, 'transform_backend', 'auto')
    if tb not in ('auto', 'matmul', 'split', 'fft', 'ozaki'):
        raise ValueError(
            f"checkpoint requests transform_backend={tb!r}, which this "
            "build does not provide")
    return params


def save_checkpoint(fname: str, solver) -> None:
    """Serialize a Solver's resumable state."""
    sol = solver.solution
    header = {
        'format_version': FORMAT_VERSION,
        'computed_steps': sol.computed_steps,
        'tau0': sol.tau0,
        't0': sol.t0,
        'stop_reason': sol.stop_reason,
        'skip_check': solver.skip_check,
        'time_delta_sum': solver.time_delta_sum,
        'delt': solver.delt,
        'params': solver.params.scalar_dict(),
        # host generator stream position (jitter / uniform / sobol state),
        # structured — no pickle on either side
        'generator_state': (solver.generator.state_dict()
                            if solver.generator is not None else None),
    }
    state = solver._state
    _atomic_savez(
        fname,
        header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
        # natural layout on disk regardless of the in-state layout
        # (fold_field keeps the device state level-1 folded)
        U=np.asarray(solver._field_natural(state.U), dtype=np.float64),
        timedata=sol.timedata.data(),
        rng_key=np.asarray(state.rng_key),
        U_init=np.asarray(solver.U_init, dtype=np.float64),
    )


def load_checkpoint(fname: str):
    """Returns (params, payload dict) — build a Solver via
    :func:`restore_solver`."""
    z = np.load(fname, allow_pickle=False)
    header = json.loads(bytes(z['header']).decode())
    if header['format_version'] != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version "
                         f"{header['format_version']}")
    params = _params_from_header(header)
    payload = {
        'header': header,
        'U': z['U'],
        'timedata': z['timedata'],
        'rng_key': z['rng_key'],
        'generator_state': header.get('generator_state'),
        'U_init': z['U_init'],
    }
    return params, payload


def restore_solver(fname: str):
    """Rebuild a prepared Solver mid-run from a checkpoint file."""
    import jax.numpy as jnp

    from .core.solver import Solver
    from .timedata import TimeData

    params, payload = load_checkpoint(fname)
    h = payload['header']
    solver = Solver(params, U_init=payload['U_init'])
    if payload['generator_state'] is not None:
        from .rng import FieldGenerator
        solver.generator = FieldGenerator.from_state(
            payload['generator_state'])
    solver.skip_check = h['skip_check']
    solver.time_delta_sum = h['time_delta_sum']
    solver.time_passed = h['time_delta_sum'] / params.M_tilde
    solver.delt = h['delt']
    solver.prepare()

    td = TimeData()
    td.insert_block(payload['timedata'])
    sol = solver.solution
    sol.timedata = td
    sol.computed_steps = h['computed_steps']
    sol.tau0 = h['tau0']
    sol.t0 = h['t0']
    sol.stop_reason = h['stop_reason']
    sol.U = payload['U']

    rows = payload['timedata']
    state = solver._state.replace(
        U=solver._field_state(payload['U']),
        delt=jnp.asarray(h['delt'], jnp.float64),
        time_delta_sum=jnp.asarray(h['time_delta_sum'], jnp.float64),
        computed_steps=jnp.asarray(h['computed_steps'], jnp.int32),
        skip_check=jnp.asarray(bool(h['skip_check'])),
        tau0=jnp.asarray(h['tau0'], jnp.float64),
        t0=jnp.asarray(h['t0'], jnp.float64),
        E2_first=jnp.asarray(rows[0, 2], jnp.float64),
        E2_prev=jnp.asarray(rows[-1, 2], jnp.float64),
        rng_key=jnp.asarray(payload['rng_key']),
    )
    solver._state = state
    return solver


# ----------------------------------------------------------------------
# ensemble checkpoint (no reference equivalent; long UQ runs need it)
# ----------------------------------------------------------------------

_ENS_LEAVES = ('delt', 'time_delta_sum', 'computed_steps', 'skip_check',
               'stop_reason', 'tau0', 't0', 'E2_first', 'E2_prev')


def save_ensemble_checkpoint(fname: str, ens, extra_header: dict = None
                             ) -> None:
    """Serialize an EnsembleSolver's resumable state: every member's
    field + counters + trace, the (A0, A1) pairs, and the shared host
    generator stream position.  Resume continues each member's exact
    trajectory (hat_U is recomputed from U at every solve entry).
    ``extra_header`` lets a driver (the UQ experiment) stash its own
    JSON-serializable progress next to the state."""
    states = ens._states
    leaves = ens._host_leaves(states.U, states.rng_key,
                              *[getattr(states, n) for n in _ENS_LEAVES])
    U, rng_key = leaves[0], leaves[1]
    if ens.cfg.fold_field:
        # on-disk fields are always the natural layout (fold re-applied
        # on restore), so fold is a pure runtime concern
        from .ops.dct import fold1_np
        U = fold1_np(np.asarray(U))
    per_member = dict(zip(_ENS_LEAVES, leaves[2:]))
    header = {
        'format_version': FORMAT_VERSION,
        'kind': 'ensemble',
        'R': ens.R,
        'params': ens.params.scalar_dict(),
        'row_counts': [len(td) for td in ens.timedatas],
        'generator_state': (ens.generator.state_dict()
                            if ens.generator is not None else None),
        'extra': extra_header,
    }
    _atomic_savez(
        fname,
        header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
        U=np.asarray(U, dtype=np.float64),
        rng_key=np.asarray(rng_key),
        A_pairs=np.stack([ens.A0s, ens.A1s], axis=1),
        kappas=np.asarray(ens.kappas),
        timedata=np.concatenate([td.data() for td in ens.timedatas],
                                axis=0),
        U_init=np.asarray(ens.U_init, dtype=np.float64),
        **{f'm_{n}': np.asarray(v) for n, v in per_member.items()},
    )


def restore_ensemble(fname: str, mesh=None):
    """Rebuild a prepared EnsembleSolver mid-run from a checkpoint."""
    import jax.numpy as jnp

    from .ensemble import EnsembleSolver
    from .timedata import TimeData

    z = np.load(fname, allow_pickle=False)
    header = json.loads(bytes(z['header']).decode())
    if header.get('kind') != 'ensemble':
        raise ValueError(f"{fname} is not an ensemble checkpoint")
    if header['format_version'] != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version "
                         f"{header['format_version']}")
    params = _params_from_header(header)

    ens = EnsembleSolver(params, np.asarray(z['A_pairs']),
                         U_init=np.asarray(z['U_init']), mesh=mesh)
    if header.get('generator_state') is not None:
        from .rng import FieldGenerator
        ens.generator = FieldGenerator.from_state(header['generator_state'])
    ens.prepare()

    # per-member traces
    rows = np.asarray(z['timedata'])
    counts = header['row_counts']
    offs = np.cumsum([0] + counts)
    ens.timedatas = []
    for r in range(header['R']):
        td = TimeData()
        td.insert_block(rows[offs[r]:offs[r + 1]])
        ens.timedatas.append(td)

    dtype = ens.cfg.jdtype
    U_in = np.asarray(z['U'])
    if ens.cfg.fold_field:
        # the checkpoint holds the natural layout; device state is folded
        from .ops.dct import fold1_np
        U_in = fold1_np(U_in)
    repl = {'U': jnp.asarray(U_in, dtype),
            'rng_key': jnp.asarray(z['rng_key'])}
    for n in _ENS_LEAVES:
        ref_leaf = getattr(ens._states, n)
        repl[n] = jnp.asarray(z[f'm_{n}'], ref_leaf.dtype)
    states = ens._states.replace(**repl)
    ens._states = ens._shard(states)
    ens._stop = np.asarray(z['m_stop_reason'], np.int64)
    ens._ckpt_extra = header.get('extra')  # driver progress (experiment)
    return ens
