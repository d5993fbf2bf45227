"""Bisect the vmapped f64 ozaki divergence: transform roundtrip alone,
vmapped vs per-member loop, on the chip."""
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

# --- folded route (the ensemble default at N=512)
fs = oz.dct_fold_slices(N)
fsd = {k: fs[k] for k in ('CeS', 'CoS', 'CeTS', 'CoTS')}
fsd['scale'] = fs['scale']

def rt_fold(u):
    return oz.idct2_ozaki_fold(oz.dct2_ozaki_fold(u, fsd), fsd)

v = jax.jit(jax.vmap(rt_fold))(x)
l = jnp.stack([jax.jit(rt_fold)(x[i]) for i in range(B)])
print('fold: vmap-vs-loop max|d|', float(jnp.abs(v - l).max()),
      ' loop rt err', float(jnp.abs(l - x).max()), flush=True)

# --- forward only
fwd = lambda u: oz.dct2_ozaki_fold(u, fsd)
vf = jax.jit(jax.vmap(fwd))(x)
lf = jnp.stack([jax.jit(fwd)(x[i]) for i in range(B)])
print('fold fwd: vmap-vs-loop max|d|', float(jnp.abs(vf - lf).max()),
      flush=True)

# --- unfolded route
Cs, CsT, sc = oz.dct_slices(N)
def rt_unf(u):
    return oz.idct2_ozaki(oz.dct2_ozaki(u, Cs, CsT, sc), Cs, CsT, sc)
vu = jax.jit(jax.vmap(rt_unf))(x)
lu = jnp.stack([jax.jit(rt_unf)(x[i]) for i in range(B)])
print('unfold: vmap-vs-loop max|d|', float(jnp.abs(vu - lu).max()),
      ' loop rt err', float(jnp.abs(lu - x).max()), flush=True)

# --- slicing alone
def slc(u):
    s, scale = oz.slice_field(u)
    return s.astype(jnp.float64) * 1.0, scale
vs_, vsc = jax.jit(jax.vmap(lambda u: oz.slice_field(u)))(x)
ls_ = jnp.stack([jax.jit(lambda u: oz.slice_field(u)[0])(x[i])
                 for i in range(B)])
print('slices: vmap-vs-loop equal',
      bool(jnp.array_equal(vs_.astype(jnp.int32), ls_.astype(jnp.int32))),
      flush=True)
