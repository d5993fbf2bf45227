#!/usr/bin/env python
"""Benchmark CLI for the TPU engine.

Own protocol (this framework's design, not the reference harness): a warmup
phase compiles the chunked program and primes the persistent XLA cache, then
R timed repetitions of a full ``solve()`` (state re-``prepare()``d before
each so every rep integrates the same trajectory).  Each rep reports wall
seconds and steps/s; the artifact is a single JSON document
(``<file-id>.bench.json``) carrying host+device info, the exact run
configuration, per-rep samples and the best/median rates — machine-readable
for cross-round comparison (the driver-level ``bench.py`` at the repo root
consumes the same engine through its own one-line metric).

Functional coverage of the reference harness (``examples/benchmark.py``):
warmups, timed repetitions, metadata capture, artifact export — surface and
internals are this framework's own.  TPU extras: per-rep steps/s, optional
``jax.profiler`` trace of the first timed rep, device topology in the
artifact.
"""

from __future__ import annotations

import contextlib
import json
import time

import numpy as np

from .. import sysinfo
from ..cli import CLIParser
from ..simulator import Simulator


def parse_bench_args(argv=None):
    """Build the bench CLI on top of the full simulation flag surface.

    Returns ``(options dict, Parameters)``."""
    cli = CLIParser('chsimpy-tpu (benchmark)')
    group = cli.parser.add_argument_group('Benchmark')
    group.add_argument('-R', '--runs', default=3, type=int,
                       help='Number of timed repetitions')
    group.add_argument('-w', '--warmups', default=1, type=int,
                       help='Number of warmup repetitions (compile+cache)')
    group.add_argument('-W', '--warmup-ntmax', type=int,
                       help='Simulation steps per warmup repetition '
                            '(default: ntmax)')
    group.add_argument('--profile-dir',
                       help='Capture a jax.profiler trace of the first '
                            'timed rep into this directory')
    params = cli.get_parameters(argv)
    args = cli.args
    params.no_gui = True
    if args.runs < 1:
        cli.parser.error('--runs must be at least 1')
    if args.warmup_ntmax is not None and args.warmup_ntmax > params.ntmax:
        cli.parser.error('--warmup-ntmax must not exceed ntmax')
    if params.png or params.png_anim:
        cli.parser.error('benchmarks run headless: drop --png/--png-anim')
    opts = {
        'runs': args.runs,
        'warmups': args.warmups,
        'warmup_ntmax': (args.warmup_ntmax if args.warmup_ntmax is not None
                         else params.ntmax),
        'profile_dir': args.profile_dir,
    }
    return opts, params


@contextlib.contextmanager
def _maybe_profile(profile_dir):
    if profile_dir is None:
        yield
        return
    import jax
    with jax.profiler.trace(profile_dir):
        yield


def measure_reps(simulator: Simulator, ntmax: int, reps: int,
                 profile_dir=None) -> list:
    """Time ``reps`` full solves of ``ntmax`` steps each; state is
    re-prepared before each rep.  Returns one sample dict per rep."""
    samples = []
    for rep in range(reps):
        simulator.params.ntmax = ntmax
        simulator.solver.prepare()
        with _maybe_profile(profile_dir if rep == 0 else None):
            t0 = time.perf_counter()
            simulator.solve()
            seconds = time.perf_counter() - t0
        steps = simulator.solver.solution.computed_steps - 1
        samples.append({
            'rep': rep,
            'seconds': round(seconds, 6),
            'steps': int(steps),
            'steps_per_s': round(steps / max(seconds, 1e-12), 3),
        })
    return samples


def _rates(samples):
    return np.array([s['steps_per_s'] for s in samples], dtype=np.float64)


def main(argv=None):
    import chsimpy_tpu as _ct
    _ct.honor_jax_platforms_env()
    opts, params = parse_bench_args(argv)

    wall_start = time.perf_counter()
    simulator = Simulator(params)
    file_id = sysinfo.get_or_create_file_id(params.file_id)

    warmup_samples = []
    if opts['warmups'] > 0:
        warmup_samples = measure_reps(simulator, opts['warmup_ntmax'],
                                      opts['warmups'])
        print(f"[warmup] {opts['warmups']} rep(s) x "
              f"{opts['warmup_ntmax']} steps: "
              + ", ".join(f"{s['seconds']:.3f}s" for s in warmup_samples))

    timed_samples = measure_reps(simulator, params.ntmax, opts['runs'],
                                 profile_dir=opts['profile_dir'])
    rates = _rates(timed_samples)
    for s in timed_samples:
        print(f"[rep {s['rep']}] {s['steps']} steps in {s['seconds']:.3f}s "
              f"-> {s['steps_per_s']:.2f} steps/s")
    print(f"[summary] N={params.N} {params.precision}: "
          f"best {rates.max():.2f} steps/s, "
          f"median {np.median(rates):.2f} steps/s "
          f"({time.perf_counter() - wall_start:.1f}s total)")

    artifact = {
        'schema': 'chsimpy-tpu-bench-v1',
        'file_id': file_id,
        'options': opts,
        'config': {
            'N': params.N, 'ntmax': params.ntmax,
            'precision': params.precision,
            'generator': params.generator, 'seed': params.seed,
            'adaptive_time': params.adaptive_time,
            'kernel_backend': params.kernel_backend,
            'transform_backend': getattr(params, 'transform_backend', None),
            'matmul_precision': params.matmul_precision,
            'chunk_size': params.chunk_size,
            'mesh_shape': params.mesh_shape,
        },
        'host': sysinfo.get_system_info(),
        'devices': sysinfo.get_device_info(),
        'warmup': warmup_samples,
        'reps': timed_samples,
        'steps_per_s': {
            'best': float(rates.max()),
            'median': float(np.median(rates)),
            'mean': float(rates.mean()),
        },
    }
    out = f"{file_id}.bench.json"
    with open(out, 'w') as f:
        json.dump(artifact, f, indent=1)
    print(f"[artifact] {out}")
    simulator.export()


if __name__ == '__main__':
    main()
