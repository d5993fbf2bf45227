"""Time the vmapped unfolded ozaki roundtrip alone at several widths."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import time
import numpy as np
import jax
import jax.numpy as jnp
import chsimpy_tpu as ct
from chsimpy_tpu.ops import ozaki as oz

assert jax.devices()[0].platform != 'cpu'
rng = np.random.default_rng(0)
N = 512
Cs, CsT, sc = oz.dct_slices(N)
fs = oz.dct_fold_slices(N)

def rt_unfold(u):
    return oz.idct2_ozaki(oz.dct2_ozaki(u, Cs, CsT, sc), Cs, CsT, sc)

def rt_fold(u):
    return oz.idct2_ozaki_fold(oz.dct2_ozaki_fold(u, fs), fs)

for name, fn in (('unfold', rt_unfold), ('fold', rt_fold)):
    for B in (1, 4, 8):
        x = jnp.asarray(0.875 * (1 + 0.01 * (rng.random((B, N, N)) - 0.5)))
        f = jax.jit(jax.vmap(fn)) if B > 1 else jax.jit(fn)
        xx = x if B > 1 else x[0]
        r = f(xx); _ = float(jnp.abs(r).max())  # compile+sync
        t0 = time.perf_counter()
        for _ in range(10):
            r = f(xx)
        _ = float(jnp.abs(r).max())
        dt = (time.perf_counter() - t0) / 10
        print(f'{name} B={B}: {dt*1e3:8.2f} ms/rt-batch '
              f'({dt*1e3/B:6.2f} ms/member)', flush=True)
