"""Where is the B=8 fold-roundtrip error, and does an extra barrier
between the halves change it?"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
import chsimpy_tpu as ct
from chsimpy_tpu.ops import ozaki as oz

assert jax.devices()[0].platform != 'cpu'
rng = np.random.default_rng(0)
N, B = 512, 8
x = jnp.asarray(0.875 * (1 + 0.01 * (rng.random((B, N, N)) - 0.5)))
fs = oz.dct_fold_slices(N)

def rt(u):
    return oz.idct2_ozaki_fold(oz.dct2_ozaki_fold(u, fs), fs)

def rt_bar(u):
    y = jax.lax.optimization_barrier(oz.dct2_ozaki_fold(u, fs))
    return oz.idct2_ozaki_fold(y, fs)

v = jax.jit(jax.vmap(rt))(x)
l = jnp.stack([jax.jit(rt)(x[i]) for i in range(B)])
d = np.abs(np.asarray(v - l))
print('max err', d.max())
print('bad entries (>1e-10) per member:',
      [(int((d[i] > 1e-10).sum())) for i in range(B)])
i = int(np.argmax(d.max(axis=(1, 2))))
r, c = np.unravel_index(np.argmax(d[i]), d[i].shape)
print(f'worst member {i} at ({r},{c}); err row0 {d[i][0].max():.2e} '
      f'col0 {d[i][:,0].max():.2e} interior {d[i][1:,1:].max():.2e}')
# is the error CONSTANT across the field (DC-like)?
dm = np.asarray(v - l)[i]
print(f'mean err {dm.mean():.3e} std {dm.std():.3e}')
vb = jax.jit(jax.vmap(rt_bar))(x)
print('with extra barrier: max|d|',
      float(np.abs(np.asarray(vb - l)).max()))
