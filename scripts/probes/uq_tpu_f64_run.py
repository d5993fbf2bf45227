"""On-chip float64 validation-mode UQ experiment (VERDICT r4 item 2).

Same design as the r4 artifact (R=16 sobol, A-seed 85972, N=512,
cinit/threshold 0.89) but --precision float64: per-member stop steps
must be EXACT vs the reference's own run (artifacts/r4/uq/ref-*).
Writes artifacts/r5/uq_f64/tpu64-*."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import os
from chsimpy_tpu.experiment import main
if __name__ == '__main__':
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          '..', '..', 'artifacts', 'r5', 'uq_f64'))
    main(['-R', '16', '--A-source', 'sobol', '--A-seed', '85972',
          '-N', '512', '--cinit', '0.89', '--threshold', '0.89',
          '--precision', 'float64', '--export-csv', 'E2', '-f', 'tpu64'])
