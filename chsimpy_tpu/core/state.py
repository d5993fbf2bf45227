"""Device-resident solver state.

A single pytree carried through the on-device ``lax.while_loop``: the
concentration field and its spectral image, the scalar time/step counters,
the early-stop bookkeeping, and a chunk-local timedata row buffer.  The
reference keeps the equivalent state scattered across Solver/Solution
attributes (``chsimpy/solver.py:45-54``, ``chsimpy/solution.py:56-61``);
here it is one immutable dataclass so the whole hot loop stays on device and
the host syncs once per chunk.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp

# stop_reason codes (host maps to the reference's strings)
STOP_NONE = 0
STOP_ENERGY = 1      # 'energy'
STOP_TIME_LIMIT = 2  # 'time-limit'
STOP_NAN = 3         # NaN health guard (reference: assert in timedata.insert)

STOP_STRINGS = {STOP_NONE: 'None', STOP_ENERGY: 'energy',
                STOP_TIME_LIMIT: 'time-limit', STOP_NAN: 'nan'}


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SolverState:
    U: jax.Array              # (N, N) concentration field
    hat_U: jax.Array          # (N, N) DCT-II of U (maintained across steps)
    delt: jax.Array           # f64 scalar, current time step
    time_delta_sum: jax.Array  # f64 scalar
    computed_steps: jax.Array  # i32 scalar (includes the prepare() row)
    skip_check: jax.Array     # bool: full_sim passed its first energy fall
    stop_reason: jax.Array    # i32, STOP_* code
    tau0: jax.Array           # f64: step count at first energy fall
    t0: jax.Array             # f64: sim-time [s] at first energy fall
    E2_first: jax.Array       # f64: E2 of row 0 (prepare)
    E2_prev: jax.Array        # f64: E2 of the previous inserted row
    rows: jax.Array           # i32: rows written into rowbuf this chunk
    rowbuf: jax.Array         # (chunk_cap, 9) f64 timedata rows
    rng_key: jax.Array        # PRNG key (device-jitter mode only)

    def replace(self, **kw) -> 'SolverState':
        return replace(self, **kw)


def init_state(U0: jax.Array, hat_U0: jax.Array, delt: float,
               E2_first: float, chunk_cap: int, seed: int) -> SolverState:
    f64 = jnp.float64
    return SolverState(
        U=U0,
        hat_U=hat_U0,
        delt=jnp.asarray(delt, f64),
        time_delta_sum=jnp.asarray(0.0, f64),
        computed_steps=jnp.asarray(1, jnp.int32),
        skip_check=jnp.asarray(False),
        stop_reason=jnp.asarray(STOP_NONE, jnp.int32),
        tau0=jnp.asarray(0.0, f64),
        t0=jnp.asarray(0.0, f64),
        E2_first=jnp.asarray(E2_first, f64),
        E2_prev=jnp.asarray(E2_first, f64),
        rows=jnp.asarray(0, jnp.int32),
        rowbuf=jnp.zeros((chunk_cap, 9), f64),
        rng_key=jax.random.PRNGKey(seed),
    )
