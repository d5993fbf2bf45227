"""Batched f32 transform at N=512: matmul vs split routes under vmap
(the UQ device phase) — single-run resolver picks matmul below 1024,
but a 16-wide batch changes the MXU economics."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import time
import numpy as np
import jax
import jax.numpy as jnp
import chsimpy_tpu as ct
from chsimpy_tpu.ops import dct as dct_ops

assert jax.devices()[0].platform != 'cpu'
rng = np.random.default_rng(0)
N = 512
prec = jax.lax.Precision.HIGH
C = dct_ops.dct_matrix(N, jnp.float32)

def rt_matmul(u):
    return dct_ops.idct2(dct_ops.dct2(u, C, precision=prec), C,
                         precision=prec)

for lv in (2, 3):
    tree = dct_ops.split_tree(N, lv, jnp.float32)

    def rt_split(u, tree=tree):
        return dct_ops.idct2_split_perm(
            dct_ops.dct2_split_perm(u, tree, precision=prec),
            tree, precision=prec)

    for B in (1, 16):
        x = jnp.asarray(0.875 * (1 + 0.01 * (rng.random((B, N, N)) - 0.5)),
                        jnp.float32)
        for name, fn in (('matmul', rt_matmul), (f'split{lv}', rt_split)):
            if name == 'matmul' and lv != 2:
                continue
            f = jax.jit(jax.vmap(fn)) if B > 1 else jax.jit(fn)
            xx = x if B > 1 else x[0]
            r = f(xx); _ = float(jnp.abs(r).max())
            t0 = time.perf_counter()
            for _i in range(20):
                r = f(xx)
            _ = float(jnp.abs(r).max())
            dt = (time.perf_counter() - t0) / 20
            print(f'{name:8s} B={B:2d}: {dt*1e6/B:7.1f} us/member-rt',
                  flush=True)
