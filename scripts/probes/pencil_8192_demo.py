"""Past-single-chip-HBM demonstration (functional, virtual mesh).

An N=8192 float64 run needs ~3.2 GB of state (f64 default route OOMs on
one v5e chip, artifacts/r4/mem_f64_8192.json); the pencil layout's
purpose is to split that footprint 1/D across a mesh.  This probe proves
the mechanism end to end on the CPU backend: a 2-way pencil-split f64
run at N=8192 whose trajectory equals the unsharded run, with a
per-device memory accounting of every sharded state leaf.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=2 \
      python scripts/probes/pencil_8192_demo.py [N] [ntmax] [--out X.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def state_accounting(solver):
    """Per-leaf (shape, shard shape, bytes, per-device bytes) table of the
    device-resident solve state."""
    state = solver._state
    fields = getattr(state, '_fields', None)
    if fields is None:
        import dataclasses
        fields = [f.name for f in dataclasses.fields(state)]
    rows = []
    for name in fields:
        x = getattr(state, name)
        if not hasattr(x, 'sharding') or getattr(x, 'ndim', 0) < 2:
            continue
        shard = x.sharding.shard_shape(x.shape)
        per_dev = int(x.dtype.itemsize) * int(np.prod(shard))
        rows.append({'leaf': name, 'shape': list(x.shape),
                     'shard_shape': list(shard),
                     'total_bytes': int(x.nbytes),
                     'per_device_bytes': per_dev,
                     'devices': len(x.sharding.device_set)})
    return rows


if __name__ == '__main__':
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np

    import chsimpy_tpu as ct
    from chsimpy_tpu.core.solver import Solver

    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    N = int(args[0]) if args else 8192
    ntmax = int(args[1]) if len(args) > 1 else 2
    out = None
    if '--out' in sys.argv:
        out = sys.argv[sys.argv.index('--out') + 1]

    D = len(jax.devices())

    def params(mesh_shape):
        p = ct.Parameters()
        p.N = N
        p.precision = 'float64'
        p.no_gui = True
        p.update_every = None
        p.full_sim = True
        p.generator = 'lcg'
        p.kappa_tilde = 2.98911291966116e-4
        p.ntmax = ntmax
        p.transform_backend = 'split'
        p.mesh_shape = mesh_shape
        return p

    t = time.time()
    s_sh = Solver(params((1, D)))
    s_sh.prepare()
    sol_sh = s_sh.solve_or_resume(ntmax)
    table = state_accounting(s_sh)
    E_sh = np.asarray(sol_sh.timedata.E).copy()
    U_sh = np.asarray(sol_sh.U)
    t_sh = time.time() - t
    print(f"sharded (1,{D}) pencil split f64 N={N}: {ntmax} steps "
          f"in {t_sh:.0f}s")
    for r in table:
        print(f"  {r['leaf']:12s} {str(r['shape']):16s} -> shard "
              f"{str(r['shard_shape']):16s} {r['per_device_bytes']/2**20:8.1f}"
              f" MiB/device (total {r['total_bytes']/2**20:.1f} MiB)")

    t = time.time()
    s_un = Solver(params(None))
    s_un.prepare()
    sol_un = s_un.solve_or_resume(ntmax)
    E_un = np.asarray(sol_un.timedata.E).copy()
    U_un = np.asarray(sol_un.U)
    t_un = time.time() - t
    print(f"unsharded: {ntmax} steps in {t_un:.0f}s")

    bit_exact = bool(np.array_equal(U_sh, U_un))
    e_rel = float(np.max(np.abs(E_sh / E_un - 1.0)))
    u_rel = float(np.max(np.abs(U_sh - U_un)) / np.max(np.abs(U_un)))
    # the FIELD leaves (>= one full N x N f64 plane) must shard 1/D;
    # the 9-column timedata row buffer stays replicated by design
    field_rows = [r for r in table if r['total_bytes'] >= N * N * 8]
    footprint_ok = bool(field_rows) and all(
        r['per_device_bytes'] * r['devices'] == r['total_bytes']
        for r in field_rows)
    print(f"fields bit-exact: {bit_exact} (U max rel {u_rel:.2e}); "
          f"E max rel: {e_rel:.2e}; "
          f"field leaves at total/{D} per device: {footprint_ok}")

    if out:
        with open(out, 'w') as f:
            json.dump({
                'schema': 'chsimpy-tpu-pencil-hbm-demo-v1',
                'N': N, 'ntmax': ntmax, 'devices': D,
                'precision': 'float64', 'transform': 'split (pencil)',
                'fields_bit_exact_vs_unsharded': bit_exact,
                'U_max_rel_vs_unsharded': u_rel,
                'E_max_rel_vs_unsharded': e_rel,
                'per_device_footprint_is_total_over_D': footprint_ok,
                'state_accounting': table,
                'wall_s': {'sharded': t_sh, 'unsharded': t_un},
            }, f, indent=1)
    sys.exit(0 if (bit_exact or (e_rel < 1e-12 and u_rel < 1e-12))
             and footprint_ok else 1)
