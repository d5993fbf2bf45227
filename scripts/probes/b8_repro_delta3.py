"""Delta round 3: stage-2 pieces of the inverse as consumer."""
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
    print(f'{name:44s} fwd err {float(jnp.abs(yv - yl).max()):.3e}',
          flush=True)


nf = min(N_SLICES, STAGE1_PAIR + 1)


def mid(y):
    ys, sy = slice_field(_dc_zero(y), nf)
    a = _pair_groups(fs['CeTS'], ys[:, 0::2, :], _dot_left,
                     max_pair=STAGE1_PAIR)
    b = _pair_groups(fs['CoTS'], ys[:, 1::2, :], _dot_left,
                     max_pair=STAGE1_PAIR)
    wg = [jnp.concatenate([p + q, (p - q)[::-1, :]], axis=0)
          for p, q in zip(a, b)]
    return _renorm_to_slices(wg, n_slices=_n_slots()), sy


def c_stage2_even(y):
    t, sy = mid(y)
    gE = _pair_groups(t[:, :, 0::2], fs['CeS'], _dot_right,
                      max_pair=STAGE2_PAIR)
    return sum(g.sum() for g in gE) * sy


def c_stage2_both_horner(y):
    t, sy = mid(y)
    gE = _pair_groups(t[:, :, 0::2], fs['CeS'], _dot_right,
                      max_pair=STAGE2_PAIR)
    gO = _pair_groups(t[:, :, 1::2], fs['CoS'], _dot_right,
                      max_pair=STAGE2_PAIR)
    gl = [p + q for p, q in zip(gE, gO)]
    ul = _horner_f64(gl, jnp.float64)
    return ul.sum() * sy


def c_full_inverse(y):
    return oz.idct2_ozaki_fold(y, fs).sum()


check('stage2 even dots', c_stage2_even)
check('stage2 both + horner (left half)', c_stage2_both_horner)
check('full inverse (sum)', c_full_inverse)
