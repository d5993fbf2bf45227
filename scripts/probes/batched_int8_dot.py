"""Is a BATCHED int8 dot (the vmapped ozaki ensemble's stage dot) still
exact and fast on the chip?  vmap turns _dot_left's (h,h)x(h,N) int8
dot_general into one with a batch dim on the rhs; if XLA's TPU lowering
of that form falls back to something inexact or loop-unrolled, the
whole f64 ensemble path inherits it (symptoms: 40x slowdown at R=4,
NaN at R=16 — artifacts/r4/ensemble_f64_chip attempt)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
import time
import numpy as np
import jax
import jax.numpy as jnp

assert jax.devices()[0].platform != 'cpu'
rng = np.random.default_rng(0)
h, N, B = 256, 512, 4
c = jnp.asarray(rng.integers(-64, 65, (h, h)), jnp.int8)
u = jnp.asarray(rng.integers(-64, 65, (B, h, N)), jnp.int8)

def dot_left(cm, um):
    return jax.lax.dot_general(cm, um, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

vdot = jax.jit(jax.vmap(lambda um: dot_left(c, um)))
r_batched = np.asarray(vdot(u))
r_loop = np.stack([np.asarray(dot_left(c, u[i])) for i in range(B)])
print('batched == loop:', np.array_equal(r_batched, r_loop))
exact = (np.asarray(c, np.int64) @ np.asarray(u, np.int64)
         .transpose(1, 0, 2).reshape(h, B * N)).reshape(h, B, N)
exact = exact.transpose(1, 0, 2)
print('batched == exact int64:', np.array_equal(r_batched, exact))

def timeit(fn, *args, reps=20):
    r = fn(*args)
    int(np.asarray(r).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    int(np.asarray(r).ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3

@jax.jit
def chain_batched(u):
    acc = jnp.zeros((B, h, N), jnp.int32)
    for _ in range(20):
        acc = acc + vdot_inner(u)
    return acc

vdot_inner = jax.vmap(lambda um: dot_left(c, um))

@jax.jit
def chain_merged(u):
    # batch merged into columns: one (h,h)x(h,B*N) dot
    um = jnp.transpose(u, (1, 0, 2)).reshape(h, B * N)
    acc = jnp.zeros((h, B * N), jnp.int32)
    for _ in range(20):
        acc = acc + dot_left(c, um)
    return acc

print('batched ms/20dots:', timeit(chain_batched, u))
print('merged  ms/20dots:', timeit(chain_merged, u))
