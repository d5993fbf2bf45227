"""A/B wall-time of the UQ experiment host pipeline on the chip.

Canonical experiment config (R=16 sobol, N=512 f32, reference default
exports U,E,E2,SA bz2 + yaml) run twice in separate processes:
--host-procs 1 (synchronous, the round-4-and-earlier behavior) vs the
default pool.  Usage: python scripts/probes/uq_hostpipe_ab.py {sync|pool}
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))

import sys
import tempfile
import time

# __main__ guard is load-bearing: the host pipeline's spawn workers
# re-import this module (as __mp_main__); unguarded top-level code would
# re-run the experiment in every worker — and reach for the TPU tunnel
if __name__ == '__main__':
    from chsimpy_tpu.experiment import main

    mode = sys.argv[1]
    runs = sys.argv[2] if len(sys.argv) > 2 else '16'
    procs = '1' if mode == 'sync' else '-1'
    d = tempfile.mkdtemp(prefix=f'uq_ab_{mode}_')
    _os.chdir(d)
    t0 = time.time()
    main(['-R', runs, '--A-source', 'sobol', '--A-seed', '85972', '-N',
          '512', '--cinit', '0.89', '--threshold', '0.89', '--precision',
          'float32', '-f', 'ab', '--host-procs', procs])
    print(f"UQ_AB {mode} R={runs} wall_s={time.time() - t0:.1f} dir={d}")
