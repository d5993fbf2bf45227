"""The fix candidate: replace the inverse's d = X[0,0] batched gather
with an exact one-hot reduce; check fold roundtrip correctness and
speed at B=4/8/16."""
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
fs = oz.dct_fold_slices(N)


def dc_get(X):
    n, m = X.shape[-2], X.shape[-1]
    mask = ((jnp.arange(n) == 0).astype(X.dtype)[:, None]
            * (jnp.arange(m) == 0).astype(X.dtype)[None, :])
    return jnp.sum(X * mask)


def inv_fixed(y):
    d = dc_get(y)
    u = oz.idct2_ozaki_fold(oz._dc_zero(y), fs)  # d inside = 0 exactly
    return u + (d - oz.dct2_ozaki_fold(jnp.zeros_like(y), fs)[0, 0]) / N \
        if False else u + d / N


def rt_fixed(u):
    y = oz.dct2_ozaki_fold(u, fs)
    # idct2_ozaki_fold but with the gather replaced: zero the DC before
    # the call (its internal d becomes 0.0 -> +0/N exact no-op), add the
    # reduce-read DC back ourselves
    d = dc_get(y)
    return oz.idct2_ozaki_fold(oz._dc_zero(y), fs) + d / N


def rt_orig(u):
    return oz.idct2_ozaki_fold(oz.dct2_ozaki_fold(u, fs), fs)


for B in (4, 8, 16):
    x = jnp.asarray(0.875 * (1 + 0.01 * (rng.random((B, N, N)) - 0.5)))
    l = jnp.stack([jax.jit(rt_orig)(x[i]) for i in range(B)])
    vf = jax.jit(jax.vmap(rt_fixed))(x)
    err = float(jnp.abs(vf - l).max())
    f = jax.jit(jax.vmap(rt_fixed))
    f(x); _ = float(vf[0, 0, 0])
    t0 = time.perf_counter()
    for _i in range(10):
        r = f(x)
    _ = float(r[0, 0, 0])
    dt = (time.perf_counter() - t0) / 10
    print(f'B={B}: fixed-rt vmap-vs-loop max|d| {err:.3e}  '
          f'{dt*1e3/B:6.2f} ms/member', flush=True)
