"""Is the recursive-fold (rfold) ozaki clean under vmap on the chip?
(The level-1 natural fold INVERSE miscomputes by ~5e-10 under vmap —
vmap_oz_transform.py probe.)"""
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
N, B = 512, 4
x = jnp.asarray(0.875 * (1 + 0.01 * (rng.random((B, N, N)) - 0.5)))

for L in (1, 2):
    rf, sc = oz.dct_rfold_slices(N, L)

    def rt(u, rf=rf, sc=sc, L=L):
        return oz.idct2_ozaki_rfold(
            oz.dct2_ozaki_rfold(u, rf, sc, L), rf, sc, L)

    v = jax.jit(jax.vmap(rt))(x)
    l = jnp.stack([jax.jit(rt)(x[i]) for i in range(B)])
    print(f'rfold{L}: vmap-vs-loop max|d| {float(jnp.abs(v - l).max()):.3e}'
          f'  loop rt err {float(jnp.abs(l - x).max()):.3e}', flush=True)

    inv = lambda y, rf=rf, sc=sc, L=L: oz.idct2_ozaki_rfold(y, rf, sc, L)
    y = jax.jit(jax.vmap(lambda u, rf=rf, sc=sc, L=L:
                         oz.dct2_ozaki_rfold(u, rf, sc, L)))(x)
    vi = jax.jit(jax.vmap(inv))(y)
    li = jnp.stack([jax.jit(inv)(y[i]) for i in range(B)])
    print(f'rfold{L} inv: vmap-vs-loop max|d| '
          f'{float(jnp.abs(vi - li).max()):.3e}', flush=True)

# and the level-1 fold INVERSE alone, for the record
fs = oz.dct_fold_slices(N)
fsd = {k: fs[k] for k in ('CeS', 'CoS', 'CeTS', 'CoTS')}
fsd['scale'] = fs['scale']
yf = jax.jit(jax.vmap(lambda u: oz.dct2_ozaki_fold(u, fsd)))(x)
vi = jax.jit(jax.vmap(lambda y: oz.idct2_ozaki_fold(y, fsd)))(yf)
li = jnp.stack([jax.jit(lambda y: oz.idct2_ozaki_fold(y, fsd))(yf[i])
                for i in range(B)])
print(f'fold inv: vmap-vs-loop max|d| {float(jnp.abs(vi - li).max()):.3e}',
      flush=True)
