"""B=8 fold-route bisect: forward alone, inverse alone, roundtrip; and
the rfold/unfolded routes for comparison."""
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
Cs, CsT, sc = oz.dct_slices(N)
rf2, rsc = oz.dct_rfold_slices(N, 2)

cases = {
    'fold fwd':   lambda u: oz.dct2_ozaki_fold(u, fs),
    'fold inv':   lambda u: oz.idct2_ozaki_fold(u, fs),
    'fold rt':    lambda u: oz.idct2_ozaki_fold(oz.dct2_ozaki_fold(u, fs), fs),
    'unfold rt':  lambda u: oz.idct2_ozaki(
        oz.dct2_ozaki(u, Cs, CsT, sc), Cs, CsT, sc),
    'rfold2 rt':  lambda u: oz.idct2_ozaki_rfold(
        oz.dct2_ozaki_rfold(u, rf2, rsc, 2), rf2, rsc, 2),
}
for name, fn in cases.items():
    v = jax.jit(jax.vmap(fn))(x)
    l = jnp.stack([jax.jit(fn)(x[i]) for i in range(B)])
    print(f'{name}: vmap-vs-loop max|d| {float(jnp.abs(v - l).max()):.3e}',
          flush=True)
