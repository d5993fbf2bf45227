import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import os
from chsimpy_tpu.experiment import main
os.chdir('artifacts/r4/uq')
main(['-R', '16', '--A-source', 'sobol', '--A-seed', '85972', '-N', '512',
      '--cinit', '0.89', '--threshold', '0.89', '--precision', 'float32',
      '--export-csv', 'E2', '-f', 'tpu'])
