"""Device-side scrambled Sobol points, bit-exact with scipy.

The reference's ``sobol`` generator draws from a stateful
``scipy.stats.qmc.Sobol(d=N, seed)`` engine in the hot loop
(``chsimpy/solver.py:69-74,210-211``).  The engine's construction-time
work — direction numbers, Owen linear-matrix scramble, digital shift —
is host-side and seeded; the *stream* afterwards is a pure function of
the point index:

    x_n = (shift XOR (XOR over set bits k of gray(n) of sv[:, k])) * 2^-bits
    gray(n) = n ^ (n >> 1)

so the device can compute any batch of points directly from the
scrambled direction-number table, with no sequential scan and no
host->device jitter streaming (the streamed slabs cost ~2 GB/chunk over
the 25 MB/s tunnel at N=512).  The identity (and bit-exactness against
``engine.random()`` / ``fast_forward``) is pinned by
tests/test_rng.py::test_device_sobol_stream_bitexact.

Host side extracts the tables from a real scipy engine (one
construction per run, setup time); the device side is 30 XOR-select
passes over the (points, dim) plane — VPU work, negligible next to the
transforms.
"""

from __future__ import annotations

import numpy as np

SOBOL_BITS = 30  # scipy.stats.qmc.Sobol default 'bits'


def sobol_tables(N: int, seed) -> tuple:
    """(sv (N, 30) uint32, shift (N,) uint32) of scipy's scrambled
    engine for d=N dimensions — construction is delegated to scipy so
    the scramble matches the reference stream bit-for-bit."""
    from scipy.stats import qmc
    e = qmc.Sobol(d=N, seed=seed)
    assert e.bits == SOBOL_BITS, (
        f"scipy Sobol bits changed ({e.bits}); the device path assumes "
        f"{SOBOL_BITS}")
    return (np.ascontiguousarray(e._sv, dtype=np.uint32),
            np.asarray(e._shift, dtype=np.uint32))


def sobol_points(sv, shift, start, npoints: int):
    """Points ``start .. start+npoints-1`` of the scrambled sequence as a
    float64 (npoints, d) array — bit-identical to
    ``engine.fast_forward(start); engine.random(npoints)``.

    ``start`` may be a traced integer scalar (the solver passes the
    running draw count).  float64 conversion of the 30-bit integers is
    exact, so the values equal scipy's doubles bit-for-bit.
    """
    import jax.numpy as jnp

    n = start.astype(jnp.uint32) + jnp.arange(npoints, dtype=jnp.uint32)
    g = n ^ (n >> 1)
    d = sv.shape[0]
    acc = jnp.zeros((npoints, d), jnp.uint32)
    zero = jnp.zeros((d,), jnp.uint32)
    for k in range(SOBOL_BITS):  # static unroll: 30 XOR-select passes
        bit = ((g >> k) & 1).astype(bool)
        acc = acc ^ jnp.where(bit[:, None], sv[:, k][None, :], zero[None, :])
    acc = acc ^ shift[None, :]
    return acc.astype(jnp.float64) * (2.0 ** -SOBOL_BITS)
