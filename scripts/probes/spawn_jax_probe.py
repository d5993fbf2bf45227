"""Does a spawn worker survive importing jax while the parent holds the
TPU tunnel?  Isolates the BrokenProcessPool seen in uq_hostpipe_ab."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(_sys.argv[0] if '__file__' not in
                                      dir() else __file__)))))


def work_nojax(i):
    import numpy as np
    return float(np.ones(4).sum() + i)


def work_jax(i):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    return float(i)


def work_pkg(i):
    from chsimpy_tpu import material
    return material.A0(900.0 + i)


def init_cpu():
    try:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    except Exception:
        pass


if __name__ == '__main__':
    import multiprocessing as mp
    from concurrent.futures import ProcessPoolExecutor

    import jax
    import jax.numpy as jnp
    x = jnp.ones((256, 256))
    print('parent devices:', jax.devices(), flush=True)
    print('parent op:', float((x @ x)[0, 0]), flush=True)

    for name, fn, init in (('nojax', work_nojax, None),
                           ('jax-in-task', work_jax, None),
                           ('jax-in-init', work_nojax, init_cpu),
                           ('pkg-in-task', work_pkg, None)):
        try:
            with ProcessPoolExecutor(
                    max_workers=2, mp_context=mp.get_context('spawn'),
                    initializer=init) as ex:
                r = list(ex.map(fn, range(2)))
            print(f'{name}: OK {r}', flush=True)
        except Exception as e:
            print(f'{name}: FAIL {type(e).__name__}: {e}', flush=True)
