"""Delta round 2: full fold forward + progressively larger pieces of
the inverse as the consumer; find the smallest consumer that corrupts
the forward."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
import chsimpy_tpu as ct
from chsimpy_tpu.ops import ozaki as oz
from chsimpy_tpu.ops.ozaki import (_pair_groups, _dot_left,
                                   _renorm_to_slices, _n_slots,
                                   slice_field, _dc_zero,
                                   STAGE1_PAIR, N_SLICES)

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
check('slice_field only', lambda y: slice_field(y, nf)[0].sum())
check('dc_zero + slice_field',
      lambda y: slice_field(_dc_zero(y), nf)[0].sum())
check('slice + strided yE gather',
      lambda y: slice_field(y, nf)[0][:, 0::2, :].sum())


def c_stage1(y):
    ys, sy = slice_field(_dc_zero(y), nf)
    yE = ys[:, 0::2, :]
    a = _pair_groups(fs['CeTS'], yE, _dot_left, max_pair=STAGE1_PAIR)
    return sum(g.sum() for g in a) * sy


check('stage1 even dots', c_stage1)


def c_stage1_both(y):
    ys, sy = slice_field(_dc_zero(y), nf)
    a = _pair_groups(fs['CeTS'], ys[:, 0::2, :], _dot_left,
                     max_pair=STAGE1_PAIR)
    b = _pair_groups(fs['CoTS'], ys[:, 1::2, :], _dot_left,
                     max_pair=STAGE1_PAIR)
    wg = [jnp.concatenate([p + q, (p - q)[::-1, :]], axis=0)
          for p, q in zip(a, b)]
    t = _renorm_to_slices(wg, n_slices=_n_slots())
    return t.astype(jnp.int32).sum() * sy


check('stage1 both + assembly + renorm', c_stage1_both)
