"""Delta round 6: the (u + d/n) batched-scalar broadcast vs scalar-after-sum."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
import chsimpy_tpu as ct
from chsimpy_tpu.ops import ozaki as oz
from chsimpy_tpu.ops.ozaki import (_pair_groups, _dot_left, _dot_right,
                                   _renorm_to_slices, _horner_f64,
                                   _n_slots, slice_field, _dc_zero,
                                   RENORM_SHIFT, STAGE1_PAIR, STAGE2_PAIR,
                                   N_SLICES)

assert jax.devices()[0].platform != 'cpu'
rng = np.random.default_rng(0)
N, B = 512, 8
x = jnp.asarray(0.875 * (1 + 0.01 * (rng.random((B, N, N)) - 0.5)))
fs = oz.dct_fold_slices(N)
yl = jnp.stack([jax.jit(lambda u: oz.dct2_ozaki_fold(u, fs))(x[i])
                for i in range(B)])


def check(name, consumer):
    def g(u):
        y = oz.dct2_ozaki_fold(u, fs)
        return y, consumer(y)
    yv, _ = jax.jit(jax.vmap(g))(x)
    print(f'{name:46s} fwd err {float(jnp.abs(yv - yl).max()):.3e}',
          flush=True)


nf = min(N_SLICES, STAGE1_PAIR + 1)


def inv_core(y):
    n = y.shape[-1]
    ys, sy = slice_field(_dc_zero(y), nf)
    a = _pair_groups(fs['CeTS'], ys[:, 0::2, :], _dot_left,
                     max_pair=STAGE1_PAIR)
    b = _pair_groups(fs['CoTS'], ys[:, 1::2, :], _dot_left,
                     max_pair=STAGE1_PAIR)
    wg = [jnp.concatenate([p + q, (p - q)[::-1, :]], axis=0)
          for p, q in zip(a, b)]
    t = _renorm_to_slices(wg, n_slices=_n_slots())
    gE = _pair_groups(t[:, :, 0::2], fs['CeS'], _dot_right,
                      max_pair=STAGE2_PAIR)
    gO = _pair_groups(t[:, :, 1::2], fs['CoS'], _dot_right,
                      max_pair=STAGE2_PAIR)
    gl = [p + q for p, q in zip(gE, gO)]
    gr = [p - q for p, q in zip(gE, gO)]
    f = sy * jnp.asarray(fs['scale'] * fs['scale'] * 2.0 ** RENORM_SHIFT,
                         jnp.float64)
    ul = _horner_f64(gl, jnp.float64) * f
    ur = _horner_f64(gr, jnp.float64)[:, ::-1] * f
    return jnp.concatenate([ul, ur], axis=1)


check('u.sum() + d/N  (scalar after sum)',
      lambda y: inv_core(y).sum() + y[0, 0] / N)
check('(u + d/N).sum() (broadcast into field)',
      lambda y: (inv_core(y) + y[0, 0] / N).sum())
check('(u + 0*d).sum() (broadcast, zero weight)',
      lambda y: (inv_core(y) + 0.0 * y[0, 0]).sum())
check('(u + mean(y)).sum() (broadcast of a reduce)',
      lambda y: (inv_core(y) + jnp.mean(y)).sum())
