"""On-disk checkpoint / resume.

The reference's only cross-process resume is ``--Uinit-file`` (reload a
previously exported U matrix, which restarts the time series,
``chsimpy/simulator.py:21-22``).  Long pod runs need a real checkpoint: the
full solver state — U, the timedata series, step/time counters, delt,
early-stop bookkeeping, and the host RNG stream position — so a resumed run
continues the exact trajectory (bit-for-bit with an uninterrupted run, since
the spectral image is recomputed from U at every solve entry anyway).

Format: a single ``.npz`` with a JSON-encoded scalar header.
"""

from __future__ import annotations

import json
import pickle

import numpy as np

FORMAT_VERSION = 1


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
    }
    state = solver._state
    # the host generator stream position (jitter / uniform / sobol state)
    gen_blob = (np.frombuffer(pickle.dumps(solver.generator), dtype=np.uint8)
                if solver.generator is not None else np.zeros(0, np.uint8))
    np.savez_compressed(
        fname,
        header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
        U=np.asarray(state.U, dtype=np.float64),
        timedata=sol.timedata.data(),
        rng_key=np.asarray(state.rng_key),
        generator=gen_blob,
        U_init=np.asarray(solver.U_init, dtype=np.float64),
    )


def load_checkpoint(fname: str):
    """Returns (params, payload dict) — build a Solver via
    :func:`restore_solver`."""
    from .params import Parameters
    z = np.load(fname, allow_pickle=False)
    header = json.loads(bytes(z['header']).decode())
    if header['format_version'] != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version "
                         f"{header['format_version']}")
    params = Parameters()
    names = {f.name for f in params.__dataclass_fields__.values()}
    for k, v in header['params'].items():
        if k in names and k != 'version':
            if k == 'mesh_shape' and v is not None:
                v = tuple(v)
            setattr(params, k, v)
    payload = {
        'header': header,
        'U': z['U'],
        'timedata': z['timedata'],
        'rng_key': z['rng_key'],
        'generator': bytes(z['generator']) if z['generator'].size else None,
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
    if payload['generator'] is not None:
        solver.generator = pickle.loads(payload['generator'])
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
        U=jnp.asarray(payload['U'], solver.cfg.jdtype),
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
