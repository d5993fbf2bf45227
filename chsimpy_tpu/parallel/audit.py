"""HLO collective audit of the sharded step program.

Compiles the grid-sharded chunk runner on a device mesh and inventories
the communication ops XLA inserted (all-gather / all-reduce /
reduce-scatter / all-to-all / collective-permute) with their output
shapes and byte volumes.  This is the multi-chip sanity signal available
without multi-chip hardware: it proves the distributed matmul-DCT
contracts via partial-shard collectives instead of silently all-gathering
the full field to every device, and it quantifies bytes-per-step for the
ICI budget (numbers recorded in PERFORMANCE.md).
"""

from __future__ import annotations

import re
from collections import defaultdict

import numpy as np

_COLLECTIVES = ('all-gather', 'all-reduce', 'reduce-scatter',
                'all-to-all', 'collective-permute')

_DTYPE_BYTES = {'f64': 8, 'f32': 4, 'bf16': 2, 'f16': 2, 's32': 4,
                'u32': 4, 's64': 8, 'u64': 8, 'pred': 1, 'c64': 8,
                'c128': 16, 's8': 1, 'u8': 1}

_SHAPE_RE = re.compile(r'(\w+)\[([\d,]*)\]')


def _shape_bytes(shape_str: str) -> int:
    m = _SHAPE_RE.match(shape_str)
    if not m:
        return 0
    dtype, dims = m.groups()
    n = 1
    for d in dims.split(','):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def collect_collectives(hlo_text: str) -> list:
    """Parse an HLO dump into [{op, shape, bytes, line}] records.

    Async collectives lower to op-start/op-done pairs.  The -start's
    printed shape is a tuple mixing operands, results, and context
    scalars (layout varies by op), so the pair is counted at its -done,
    whose printed shape IS the collective's result — the same convention
    the sync forms use.  -start lines are skipped."""
    out = []
    for line in hlo_text.splitlines():
        s = line.strip()
        # the shape may be a single token (f32[512,512]{1,0}) or a
        # tuple with spaces ((f32[...], f32[...]) all-gather-start(...))
        m = re.match(r'.*?=\s*(\([^)]*\)|\S+)\s+([a-z][a-z\-]*)\(', s)
        if not m:
            continue
        shape_str, op = m.groups()
        if op.endswith('-start'):
            continue
        is_done = op.endswith('-done')
        op = re.sub(r'-done$', '', op)
        if op not in _COLLECTIVES:
            continue
        parts = [_shape_bytes(p)
                 for p in re.findall(r'\w+\[[\d,]*\]', shape_str)]
        nbytes = sum(parts) or _shape_bytes(shape_str)
        out.append({'op': op, 'shape': shape_str, 'bytes': nbytes,
                    'async': is_done, 'line': s[:160]})
    return out


def audit_sharded_chunk(N: int = 256, mesh_shape=(2, 4),
                        precision: str = 'float32',
                        transform: str = None) -> dict:
    """Compile the sharded chunk runner and inventory its collectives.

    Returns {'records', 'per_op_bytes', 'total_bytes', 'field_bytes',
    'max_single_collective_bytes'}."""
    import jax.numpy as jnp

    from ..params import Parameters
    from ..core.solver import Solver

    p = Parameters()
    p.N = N
    p.precision = precision
    if transform:
        p.transform_backend = transform
    p.mesh_shape = tuple(mesh_shape)
    p.kappa_tilde = 2.98911291966116e-4  # skip the sympy solve
    p.no_gui = True
    solver = Solver(p)
    solver.prepare()
    lowered = solver._run_chunk.lower(
        solver._state, jnp.asarray(4, jnp.int32), solver._consts,
        solver._null_jbuf)
    hlo = lowered.compile().as_text()
    records = collect_collectives(hlo)
    per_op = defaultdict(int)
    for r in records:
        per_op[r['op']] += r['bytes']
    field_bytes = N * N * np.dtype(precision).itemsize
    return {
        'records': records,
        'per_op_bytes': dict(per_op),
        'total_bytes': int(sum(r['bytes'] for r in records)),
        'field_bytes': int(field_bytes),
        'max_single_collective_bytes': int(
            max((r['bytes'] for r in records), default=0)),
        'n_collectives': len(records),
    }


def audit_ensemble_chunk(N: int = 256, n_ens: int = 8,
                         precision: str = 'float32') -> dict:
    """Compile the vmapped ensemble chunk sharded over an ('ens',)-only
    mesh and inventory its cross-member collectives.

    The member programs are independent except for the vmapped
    while_loop's continue predicate (ANY member active) — the audit
    quantifies exactly how many bytes per step the ensemble axis moves
    over DCN (expected: scalar-class, i.e. the axis scales at the
    straggler bound, not a wire bound)."""
    import jax.numpy as jnp
    import numpy as np

    from ..params import Parameters
    from .. import material
    from ..ensemble import EnsembleSolver
    from .mesh import make_ensemble_mesh

    p = Parameters()
    p.N = N
    p.precision = precision
    p.kappa_tilde = 2.98911291966116e-4
    p.no_gui = True
    mesh = make_ensemble_mesh(n_ens, (1, 1))
    A0 = material.A0(p.temp)
    A1 = material.A1(p.temp)
    pairs = np.array([[A0 * (1 + 0.0005 * i), A1 * (1 - 0.0005 * i)]
                      for i in range(n_ens)])
    ens = EnsembleSolver(p, pairs, mesh=mesh)
    ens.prepare()
    lowered = ens._run.lower(ens._states, jnp.asarray(4, jnp.int32),
                             ens._consts, ens._null_jbuf)
    hlo = lowered.compile().as_text()
    records = collect_collectives(hlo)
    per_op = defaultdict(int)
    for r in records:
        per_op[r['op']] += r['bytes']
    field_bytes = N * N * np.dtype(precision).itemsize
    return {
        'records': records,
        'per_op_bytes': dict(per_op),
        'total_bytes': int(sum(r['bytes'] for r in records)),
        'field_bytes': int(field_bytes),
        'max_single_collective_bytes': int(
            max((r['bytes'] for r in records), default=0)),
        'n_collectives': len(records),
    }


def main(argv=None):
    import argparse
    import json

    import chsimpy_tpu as _ct
    _ct.honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('-N', type=int, default=256)
    ap.add_argument('--mesh', default='2x4')
    ap.add_argument('--precision', default='float32')
    ap.add_argument('--transform', default=None,
                    help='force a transform route (matmul | ozaki)')
    ap.add_argument('--out', default=None)
    args = ap.parse_args(argv)
    mesh_shape = tuple(int(v) for v in args.mesh.split('x'))
    res = audit_sharded_chunk(args.N, mesh_shape, args.precision,
                              transform=args.transform)
    print(f"# sharded chunk, N={args.N}, mesh={mesh_shape}, "
          f"{args.precision}: {res['n_collectives']} collectives")
    for op, b in sorted(res['per_op_bytes'].items()):
        print(f"  {op}: {b / 1e6:.2f} MB")
    print(f"  total: {res['total_bytes'] / 1e6:.2f} MB "
          f"({res['total_bytes'] / res['field_bytes']:.1f}x the field); "
          f"largest single: {res['max_single_collective_bytes'] / 1e6:.2f} "
          "MB")
    if args.out:
        res = dict(res)
        res['records'] = res['records'][:200]
        with open(args.out, 'w') as f:
            json.dump(res, f, indent=1)


if __name__ == '__main__':
    main()
