"""vmapped ozaki roundtrip vs batch width on the chip: where does B=16
break?  (R<=8 member trajectories are exact; R=16 shows DC-scale U
errors after 20 steps.)"""
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
N = 512
L = 1  # the N=512 resolver path is level-1 fold; also try rfold below
xfull = jnp.asarray(0.875 * (1 + 0.01 * (rng.random((16, N, N)) - 0.5)))

fs = oz.dct_fold_slices(N)

def rt(u):
    return oz.idct2_ozaki_fold(oz.dct2_ozaki_fold(u, fs), fs)

for B in (2, 4, 8, 12, 16):
    x = xfull[:B]
    v = jax.jit(jax.vmap(rt))(x)
    l = jnp.stack([jax.jit(rt)(x[i]) for i in range(B)])
    print(f'fold1 B={B}: vmap-vs-loop max|d| '
          f'{float(jnp.abs(v - l).max()):.3e}', flush=True)
