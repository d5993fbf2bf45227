"""Production-scale UQ campaign on one chip: R=256 sobol members, N=512
f32, reference default exports, -P 64 device batches so the host
pipeline overlaps the next batch's device solve."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))

if __name__ == '__main__':
    import tempfile
    import time

    from chsimpy_tpu.experiment import main

    d = tempfile.mkdtemp(prefix='uq_campaign_')
    _os.chdir(d)
    t0 = time.time()
    main(['-R', '256', '-P', '64', '--A-source', 'sobol', '--A-seed',
          '85972', '-N', '512', '--cinit', '0.89', '--threshold', '0.89',
          '--precision', 'float32', '-f', 'camp'])
    print(f"UQ_CAMPAIGN R=256 wall_s={time.time() - t0:.1f} dir={d}")
