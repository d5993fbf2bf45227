"""Random-field generation for initial conditions and per-step jitter.

Mirrors the four generators of the reference (``chsimpy/solver.py:56-82``)
bit-for-bit on the host:

* ``lcg``     — MATLAB-style float64 LCG (``chsimpy/mport.py:8-32``); runs in
                native C (sequential recurrence) with a NumPy fallback.
* ``uniform`` — NumPy PCG64 stream.
* ``sobol``   — scipy ``qmc.Sobol(d=N, seed)`` stream (gated on scipy).
* ``simplex`` — OpenSimplex noise over ``linspace(0, 48, N)`` (our own
                implementation in noise.py; deterministic, unseeded).

All generators run host-side: they are setup-time (or, for jitter, streamed
per chunk) and must match the reference RNGs exactly, which on-device
threefry can't.  A fast non-bit-exact device jitter path lives in the
stepper (``jitter_backend='device'``).
"""

from __future__ import annotations

import ctypes

import numpy as np


# ----------------------------------------------------------------------
# MATLAB-style LCG (float64 semantics are part of the spec: a*x exceeds
# 2^53, so each iteration's rounding defines the sequence)
# ----------------------------------------------------------------------

_LCG_A = np.float64(1103515245)
_LCG_C = np.float64(12345)
_LCG_M = np.float64(2 ** 31)


def _matlab_lcg_sample_py(n1: int, n2: int, seed) -> np.ndarray:
    x = np.float64(seed)
    total = n1 * n2
    flat = np.empty(total, dtype=np.float64)
    a, c, m = _LCG_A, _LCG_C, _LCG_M
    for i in range(total):
        x = (a * x + c) % m
        flat[i] = x
    # column-major placement like MATLAB
    sample = flat.reshape(n2, n1).T.copy()
    sample /= (m - 1)
    return sample


def matlab_lcg_sample(n1: int, n2: int, seed) -> np.ndarray:
    """n1 x n2 matrix of pseudo-random values on [0,1), column-major order,
    bit-exact with the reference golden vector (tests/test.py:25-37)."""
    from .native import get_lcg_lib
    lib = get_lcg_lib()
    if lib is None:
        return _matlab_lcg_sample_py(n1, n2, seed)
    out = np.empty((n1, n2), dtype=np.float64)
    lib.lcg_fill_colmajor(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n1, n2, float(seed))
    return out


# ----------------------------------------------------------------------
# Generator dispatch
# ----------------------------------------------------------------------

class FieldGenerator:
    """Stateful host-side random-field source.

    ``initial_field(XXX)`` builds U0; ``next_sample()`` draws the next (N,N)
    sample from the same stream (used by per-step jitter, which in the
    reference reuses the init generator's state, ``chsimpy/solver.py:210``).
    """

    def __init__(self, kind: str, N: int, seed: int):
        self.kind = kind
        self.N = N
        self.seed = seed
        self._qrng = None
        self._rng = None
        self._simplex_field = None
        if kind == 'sobol':
            from scipy.stats import qmc  # gated: only sobol needs scipy
            self._qrng = qmc.Sobol(d=N, seed=seed)
        elif kind == 'uniform':
            self._rng = np.random.Generator(np.random.PCG64(seed))
        elif kind == 'simplex':
            from . import noise
            lin = np.linspace(0, 48, N)
            self._simplex_field = noise.noise2array(lin, lin)
        elif kind != 'lcg':
            raise ValueError(f"unknown generator '{kind}'")

    def next_sample(self) -> np.ndarray:
        """Next (N, N) sample from the stream."""
        if self.kind == 'uniform':
            return self._rng.random((self.N, self.N))
        if self.kind == 'sobol':
            return self._qrng.random(self.N)
        if self.kind == 'simplex':
            return self._simplex_field  # deterministic: same field each draw
        raise ValueError(
            "the 'lcg' generator has no sample stream (matches the "
            "reference, where jitter with -g lcg is unsupported)")

    # -- explicit (pickle-free) stream-position serialization ----------
    #
    # Checkpoints must not execute arbitrary code on restore, so the
    # stream state is structured data: PCG64 words for 'uniform', the
    # draw count for 'sobol' (scipy's engine replays deterministically
    # via fast_forward), nothing extra for the stateless kinds.

    def state_dict(self) -> dict:
        """JSON-serializable stream position (see :meth:`from_state`)."""
        d = {'kind': self.kind, 'N': self.N, 'seed': self.seed}
        if self.kind == 'uniform':
            st = self._rng.bit_generator.state
            # 128-bit ints as strings: survives any JSON reader
            d['pcg64'] = {'state': str(st['state']['state']),
                          'inc': str(st['state']['inc']),
                          'has_uint32': int(st['has_uint32']),
                          'uinteger': int(st['uinteger'])}
        elif self.kind == 'sobol':
            d['sobol_num_generated'] = int(self._qrng.num_generated)
        return d

    @classmethod
    def from_state(cls, d: dict) -> 'FieldGenerator':
        """Rebuild a generator at the exact stream position captured by
        :meth:`state_dict` (bit-exact continuation)."""
        gen = cls(d['kind'], int(d['N']), d['seed'])
        if d['kind'] == 'uniform':
            p = d['pcg64']
            gen._rng.bit_generator.state = {
                'bit_generator': 'PCG64',
                'state': {'state': int(p['state']), 'inc': int(p['inc'])},
                'has_uint32': int(p['has_uint32']),
                'uinteger': int(p['uinteger'])}
        elif d['kind'] == 'sobol':
            n = int(d['sobol_num_generated'])
            if n:
                gen._qrng.fast_forward(n)
        return gen

    def initial_field(self, XXX: float) -> np.ndarray:
        """U0 from mean concentration XXX and 1% relative deviations
        (``chsimpy/solver.py:66-82``)."""
        if self.kind == 'lcg':
            return XXX + (XXX * 0.01 * matlab_lcg_sample(self.N, self.N, self.seed))
        return XXX + (XXX * 0.01 * (self.next_sample() - 0.5))
