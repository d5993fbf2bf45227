#!/usr/bin/env python
"""Benchmark harness CLI.

Mirrors the reference protocol (``examples/benchmark.py:23-123``): warmup
repetitions + R timed repetitions of a full ``solve()`` (re-``prepare()``
before each), then a CSV with sysinfo + timings.  TPU extensions: steps/s
per chip, optional ``jax.profiler`` trace capture, device info in metadata.
"""

from __future__ import annotations

import time

import numpy as np

from .. import sysinfo
from ..cli import CLIParser
from ..simulator import Simulator


class BenchmarkParams:
    def __init__(self):
        self.runs = 3
        self.warmups = 1
        self.warmup_ntmax = 100
        self.profile_dir = None


class BenchmarkCLIParser:
    def __init__(self):
        self.cliparser = CLIParser('chsimpy-tpu (benchmark)')
        group = self.cliparser.parser.add_argument_group('Benchmark')
        group.add_argument('-R', '--runs', default=3, type=int,
                           help='Number of timed repetitions')
        group.add_argument('-w', '--warmups', default=1, type=int,
                           help='Number of benchmark warmups')
        group.add_argument('-W', '--warmup-ntmax', type=int,
                           help='Simulation steps per warmup repetition')
        group.add_argument('--profile-dir',
                           help='Capture a jax.profiler trace of the first '
                                'timed run into this directory')

    def get_parameters(self, argv=None):
        params = self.cliparser.get_parameters(argv)
        bmark_params = BenchmarkParams()
        args = self.cliparser.args
        bmark_params.runs = args.runs
        bmark_params.warmups = args.warmups
        bmark_params.profile_dir = args.profile_dir
        params.no_gui = True
        if args.warmup_ntmax is not None:
            bmark_params.warmup_ntmax = args.warmup_ntmax
            if bmark_params.warmup_ntmax > params.ntmax:
                self.cliparser.parser.error(
                    'Warmup ntmax must be less or equal than ntmax')
        else:
            bmark_params.warmup_ntmax = params.ntmax
        if bmark_params.runs < 1:
            self.cliparser.parser.error('ERROR: --runs must be at least 1.')
        if params.png or params.png_anim:
            self.cliparser.parser.error(
                'Visualization must be disabled when running benchmarks.')
        return bmark_params, params


def time_repetitions(simulator: Simulator, ntmax: int, repetitions: int,
                     profile_dir=None):
    """Reference protocol (``examples/benchmark.py:68-76``): re-prepare,
    then time a full solve."""
    tv_run = np.zeros(repetitions)
    steps = np.zeros(repetitions, dtype=np.int64)
    for i in range(repetitions):
        simulator.params.ntmax = ntmax
        simulator.solver.prepare()
        ctx = None
        if profile_dir is not None and i == 0:
            import jax
            ctx = jax.profiler.trace(profile_dir)
            ctx.__enter__()
        t1 = time.time()
        simulator.solve()
        tv_run[i] = time.time() - t1
        if ctx is not None:
            ctx.__exit__(None, None, None)
        steps[i] = simulator.solver.solution.computed_steps - 1
    return tv_run, steps


def main(argv=None):
    import chsimpy_tpu as _ct
    _ct.honor_jax_platforms_env()
    bmark_cliparser = BenchmarkCLIParser()
    bmark_cliparser.cliparser.print_info()
    bmark_params, params = bmark_cliparser.get_parameters(argv)

    sysinfo_list = sysinfo.get_system_info()
    bmark_params_list = sysinfo.vars_to_list(bmark_params)

    ts_warmup = None
    ts_runs = None
    t1 = time.time()
    simulator = Simulator(params)
    if bmark_params.warmups > 0:
        ts_warmup, _ = time_repetitions(simulator,
                                        ntmax=bmark_params.warmup_ntmax,
                                        repetitions=bmark_params.warmups)
        print(f"Warmup ({bmark_params.warmups} repetitions, "
              f"ntmax={bmark_params.warmup_ntmax}):")
        print(f" run/single: {ts_warmup} sec")
        print(f" run/sum:  {sum(ts_warmup)} sec")

    steps_per_s = None
    if bmark_params.runs > 0:
        ts_runs, steps = time_repetitions(
            simulator, ntmax=params.ntmax,
            repetitions=bmark_params.runs,
            profile_dir=bmark_params.profile_dir)
        steps_per_s = steps / np.maximum(ts_runs, 1e-12)
        print(f"Benchmark ({bmark_params.runs} repetitions, "
              f"ntmax={params.ntmax}, time_max={params.time_max}):")
        print(f" run/single: {ts_runs} sec")
        print(f" run/sum:  {sum(ts_runs)} sec")
        print(f" steps/s per rep: {steps_per_s}")

    time_total = time.time() - t1
    print(f"Benchmark Total: {time_total} sec")
    file_id = simulator.solution_file_id or sysinfo.get_or_create_file_id(
        params.file_id)
    with open(f"{file_id}.csv", 'w') as f:
        f.write("\n".join(sysinfo_list + bmark_params_list))
        f.write("\n")
        f.write(f"warmup,{ts_warmup}\n")
        f.write(f"runs,{ts_runs}\n")
        f.write(f"steps_per_s,{steps_per_s}\n")
        f.write(f"total,{time_total}\n")
    print('Output files:')
    print(f"  results and meta data: {file_id}.csv")
    simulator.export()
    if simulator.export_requested():
        print(f"  solution & parameters: {file_id}.csv")


if __name__ == '__main__':
    main()
