"""Delta-debug the B>=8 fused-forward miscompile toward a minimal
reproducer.  Each candidate is a stripped-down forward; 'consumer' is a
cheap op standing in for the inverse (the fusion trigger)."""
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
                                   _interleave, _n_slots, slice_field,
                                   RENORM_SHIFT, STAGE1_PAIR, STAGE2_PAIR,
                                   N_SLICES)

assert jax.devices()[0].platform != 'cpu'
rng = np.random.default_rng(0)
N, B = 512, 8
x = jnp.asarray(0.875 * (1 + 0.01 * (rng.random((B, N, N)) - 0.5)))
fs = oz.dct_fold_slices(N)
h = N // 2


def check(name, fn, consumer=True):
    g = (lambda u: jnp.tanh(fn(u) * 1e-3)) if consumer else fn
    v = jax.jit(jax.vmap(g))(x)
    l = jnp.stack([jax.jit(g)(x[i]) for i in range(B)])
    print(f'{name:38s} max|d| {float(jnp.abs(v - l).max()):.3e}',
          flush=True)


def fwd_full(u):
    return oz.dct2_ozaki_fold(u, fs)


def fwd_one_branch(u):
    """Only the even branch: row fold -> slice -> stage1 -> colfold ->
    renorm -> stage2 -> horner (no interleave, single quarter)."""
    m = jnp.mean(u)
    X = u - m
    a = X[:h] + X[h:][::-1]
    us, su = slice_field(a, min(N_SLICES, STAGE1_PAIR + 1))
    ge = _pair_groups(fs['CeS'], us, _dot_left, max_pair=STAGE1_PAIR)
    p = [g[:, :h] + g[:, h:][:, ::-1] for g in ge]
    t = _renorm_to_slices(p, n_slices=_n_slots())
    g2 = _pair_groups(t, fs['CeTS'], _dot_right, max_pair=STAGE2_PAIR)
    z = _horner_f64(g2, jnp.float64)
    return z * (su * jnp.asarray(
        fs['scale'] * fs['scale'] * 2.0 ** RENORM_SHIFT, jnp.float64))


def fwd_no_colfold(u):
    """Even branch without the column fold (stage 2 on full columns)."""
    m = jnp.mean(u)
    X = u - m
    a = X[:h] + X[h:][::-1]
    us, su = slice_field(a, min(N_SLICES, STAGE1_PAIR + 1))
    ge = _pair_groups(fs['CeS'], us, _dot_left, max_pair=STAGE1_PAIR)
    t = _renorm_to_slices(ge, n_slices=_n_slots())
    g2 = _pair_groups(t[:, :, :h], fs['CeTS'], _dot_right,
                      max_pair=STAGE2_PAIR)
    z = _horner_f64(g2, jnp.float64)
    return z * su


def fwd_no_rowfold(u):
    """Even branch but slice the raw top half (no reversed add)."""
    m = jnp.mean(u)
    X = u - m
    a = X[:h]
    us, su = slice_field(a, min(N_SLICES, STAGE1_PAIR + 1))
    ge = _pair_groups(fs['CeS'], us, _dot_left, max_pair=STAGE1_PAIR)
    p = [g[:, :h] + g[:, h:][:, ::-1] for g in ge]
    t = _renorm_to_slices(p, n_slices=_n_slots())
    g2 = _pair_groups(t, fs['CeTS'], _dot_right, max_pair=STAGE2_PAIR)
    z = _horner_f64(g2, jnp.float64)
    return z * su


check('full fold fwd + consumer', fwd_full)
check('full fold fwd, no consumer', fwd_full, consumer=False)
check('even branch only + consumer', fwd_one_branch)
check('even branch, no colfold', fwd_no_colfold)
check('even branch, no rowfold', fwd_no_rowfold)
