"""Candidate workarounds for the B>=8 fused-forward miscompute: barriers
at the row fold / column fold / quarters of a probe copy of
dct2_ozaki_fold, composed with the real inverse."""
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
                                   _interleave, _n_slots, _dc_add,
                                   slice_field, RENORM_SHIFT,
                                   STAGE1_PAIR, STAGE2_PAIR, N_SLICES)

assert jax.devices()[0].platform != 'cpu'
rng = np.random.default_rng(0)
N, B = 512, 8
x = jnp.asarray(0.875 * (1 + 0.01 * (rng.random((B, N, N)) - 0.5)))
fs = oz.dct_fold_slices(N)

def fwd(U, bar_rowfold=False, bar_colfold=False, bar_quarters=False):
    dtype = U.dtype
    n = U.shape[-1]
    h = n // 2
    m = jnp.mean(U)
    X = U - m
    u = X[:h] + X[h:][::-1]
    v = X[:h] - X[h:][::-1]
    if bar_rowfold:
        u, v = jax.lax.optimization_barrier((u, v))
    n_field = min(N_SLICES, STAGE1_PAIR + 1)
    us, su = slice_field(u, n_field)
    vs, sv = slice_field(v, n_field)
    ge = _pair_groups(fs['CeS'], us, _dot_left, max_pair=STAGE1_PAIR)
    go = _pair_groups(fs['CoS'], vs, _dot_left, max_pair=STAGE1_PAIR)

    def colfold(gs):
        p = [g[:, :h] + g[:, h:][:, ::-1] for g in gs]
        q = [g[:, :h] - g[:, h:][:, ::-1] for g in gs]
        if bar_colfold:
            p = list(jax.lax.optimization_barrier(tuple(p)))
            q = list(jax.lax.optimization_barrier(tuple(q)))
        return p, q

    pe, qe = colfold(ge)
    po, qo = colfold(go)
    ns = _n_slots()
    quarters = []
    for grp, mcol, s in ((pe, 'CeTS', su), (qe, 'CoTS', su),
                         (po, 'CeTS', sv), (qo, 'CoTS', sv)):
        t = _renorm_to_slices(grp, n_slices=ns)
        g2 = _pair_groups(t, fs[mcol], _dot_right, max_pair=STAGE2_PAIR)
        z = _horner_f64(g2, jnp.dtype(dtype).type)
        quarters.append(z * (s * jnp.asarray(
            fs['scale'] * fs['scale'] * 2.0 ** RENORM_SHIFT, dtype)))
    if bar_quarters:
        quarters = list(jax.lax.optimization_barrier(tuple(quarters)))
    zee, zeo, zoe, zoo = quarters
    Y = _interleave(_interleave(zee, zeo, axis=1),
                    _interleave(zoe, zoo, axis=1), axis=0)
    Y = jax.lax.optimization_barrier(Y)
    return _dc_add(Y, m * n)

yl = jnp.stack([jax.jit(lambda u: oz.dct2_ozaki_fold(u, fs))(x[i])
                for i in range(B)])
for kw in ({}, {'bar_rowfold': True}, {'bar_colfold': True},
           {'bar_quarters': True},
           {'bar_rowfold': True, 'bar_colfold': True}):
    def both(u, kw=kw):
        y = fwd(u, **kw)
        return y, oz.idct2_ozaki_fold(y, fs)
    yv, uv = jax.jit(jax.vmap(both))(x)
    print(f'{str(kw) or "none":45s} fwd err '
          f'{float(jnp.abs(yv - yl).max()):.3e}', flush=True)
