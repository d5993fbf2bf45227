"""f32 split-route roundtrip under vmap at B=8/16 vs loop (chip): does
the int8 fold miscompile have an f32 analogue?"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
import chsimpy_tpu as ct
from chsimpy_tpu.ops import dct as dct_ops

assert jax.devices()[0].platform != 'cpu'
rng = np.random.default_rng(0)
for N, lv in ((512, 2), (1024, 2)):
    tree = dct_ops.split_tree(N, lv, jnp.float32)
    prec = jax.lax.Precision.HIGH

    def rt(u, tree=tree):
        return dct_ops.idct2_split_perm(
            dct_ops.dct2_split_perm(u, tree, precision=prec),
            tree, precision=prec)

    for B in (4, 8, 16):
        x = jnp.asarray(0.875 * (1 + 0.01 * (rng.random((B, N, N)) - 0.5)),
                        jnp.float32)
        v = jax.jit(jax.vmap(rt))(x)
        l = jnp.stack([jax.jit(rt)(x[i]) for i in range(B)])
        print(f'N={N} B={B}: vmap-vs-loop max|d| '
              f'{float(jnp.abs(v - l).max()):.3e}', flush=True)
