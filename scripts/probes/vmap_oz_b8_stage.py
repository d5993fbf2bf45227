"""Inside the fused B=8 program, is the forward's output already wrong,
or does the inverse corrupt a correct spectral input?"""
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

def both(u):
    y = oz.dct2_ozaki_fold(u, fs)
    return y, oz.idct2_ozaki_fold(y, fs)

yv, uv = jax.jit(jax.vmap(both))(x)
yl = jnp.stack([jax.jit(lambda u: oz.dct2_ozaki_fold(u, fs))(x[i])
                for i in range(B)])
ul = jnp.stack([jax.jit(lambda y: oz.idct2_ozaki_fold(y, fs))(yl[i])
                for i in range(B)])
print('fused fwd y vs loop: ', float(jnp.abs(yv - yl).max()))
print('fused rt  u vs loop: ', float(jnp.abs(uv - ul).max()))
# feed the LOOP-computed spectral input into a vmapped inverse alone
ui = jax.jit(jax.vmap(lambda y: oz.idct2_ozaki_fold(y, fs)))(yl)
print('vmap inv(loop y) vs loop:', float(jnp.abs(ui - ul).max()))
