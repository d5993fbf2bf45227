#!/usr/bin/env python
"""Analytic strong-scaling prediction for the grid-sharded step.

Multi-chip hardware is unavailable, so this bounds what the sharded
program *should* do before hardware shows up, falsifiably: it compiles
the real sharded step on virtual CPU meshes, reads the per-device
collective byte volume XLA actually inserted (parallel/audit.py), and
combines it with (a) the measured single-chip step times and (b) a v5e
ICI link model into a predicted steps/s table (recorded in
PERFORMANCE.md).  The day real chips arrive, benchmarks/scaling.py
measures the same configs and the prediction is checked, not vibes.

Wire model (documented assumptions, per device, ring algorithms;
A = devices participating — approximated by the total mesh size D since
the audit does not attribute collectives to mesh axes, which over-counts
by at most 2x via the (A-1)/A factor):

* all-gather     result bytes b  -> b * (D-1)/D        one-way wire
* all-reduce     result bytes b  -> 2 * b * (D-1)/D
* reduce-scatter result bytes b  -> b * (D-1)
* all-to-all     result bytes b  -> b * (D-1)/D
* collective-permute           b -> b

v5e ICI (public): 2-D torus, ~45 GB/s one-way per link, 4 links/chip.
Optimistic bound: all 4 links utilized (180 GB/s/chip); pessimistic:
one link (45 GB/s).  Compute is assumed to scale ideally (t1/D — the
DCT matmul FLOPs and every elementwise pass split 1/D) and NOT to
overlap with communication; real overlap pushes results toward the
optimistic column.
"""

import argparse
import json
import os
import sys

MAX_DEVICES = 16
os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '')
    + f' --xla_force_host_platform_device_count={MAX_DEVICES}')
os.environ['JAX_PLATFORMS'] = 'cpu'

# measured single-chip ms/step (PERFORMANCE.md; f32 rows carry the
# round-5 defaults — asymmetric forward + banded inverse + otf
# coefficient rebuild — the honest denominator for "efficiency vs the
# best single chip" even though the sharded run cannot use fold-field
# and the banded/otf auto gates stay single-device)
SINGLE_CHIP_MS = {
    ('float32', 2048): 0.63,   # 1608-1625 steps/s (round 5)
    ('float32', 4096): 3.45,   # 289.8-291.7 steps/s (round 5)
    ('float32', 8192): 27.8,   # 36.0 steps/s (round 5)
    ('float64', 4096): 51.5,   # ozaki rfold2 + fwd trim, 19.4 steps/s (r5)
}

ICI_LINK_GBS = 45.0      # one-way per link, v5e
ICI_LINKS = 4            # 2-D torus

_WIRE_FACTOR = {
    'all-gather': lambda b, d: b * (d - 1) / d,
    'all-reduce': lambda b, d: 2.0 * b * (d - 1) / d,
    'reduce-scatter': lambda b, d: b * (d - 1),
    'all-to-all': lambda b, d: b * (d - 1) / d,
    'collective-permute': lambda b, d: b,
}


def wire_bytes_per_device(per_op_bytes: dict, n_devices: int) -> float:
    return sum(_WIRE_FACTOR[op](b, n_devices)
               for op, b in per_op_bytes.items())


def predict(N, mesh_shape, precision, transform=None):
    from chsimpy_tpu.parallel.audit import audit_sharded_chunk
    D = mesh_shape[0] * mesh_shape[1]
    res = audit_sharded_chunk(N, mesh_shape, precision, transform=transform)
    wire = wire_bytes_per_device(res['per_op_bytes'], D)
    t1 = SINGLE_CHIP_MS[(precision, N)] / 1e3
    t_comp = t1 / D
    t_ici_opt = wire / (ICI_LINK_GBS * 1e9 * ICI_LINKS)
    t_ici_pess = wire / (ICI_LINK_GBS * 1e9)
    pred_opt = 1.0 / (t_comp + t_ici_opt)
    pred_pess = 1.0 / (t_comp + t_ici_pess)
    return {
        'N': N, 'mesh': list(mesh_shape), 'devices': D,
        'precision': precision,
        'transform': transform or 'default',
        'per_op_bytes': res['per_op_bytes'],
        'collective_bytes_per_step': res['total_bytes'],
        'wire_bytes_per_device_per_step': int(wire),
        'single_chip_steps_per_s': 1.0 / t1,
        'pred_steps_per_s_optimistic': pred_opt,
        'pred_steps_per_s_pessimistic': pred_pess,
        'efficiency_optimistic': pred_opt * t1 / D,
        'efficiency_pessimistic': pred_pess * t1 / D,
    }


def main(argv=None):
    import chsimpy_tpu as _ct
    _ct.honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--out', default=None)
    ap.add_argument('--quick', action='store_true',
                    help='N=2048 f32 only (CI-sized)')
    args = ap.parse_args(argv)

    configs = [(2048, 'float32', None)]
    if not args.quick:
        # default (auto) f32 rows resolve to the split-pencil route since
        # round 4; the explicit 'matmul' rows keep the grid-sharded
        # contraction on record for comparison
        configs += [(4096, 'float32', None), (8192, 'float32', None),
                    (4096, 'float32', 'matmul'),
                    (4096, 'float64', 'ozaki')]
    meshes = [(1, 2), (2, 2), (2, 4), (4, 4)]

    rows = []
    print('| N | prec | mesh | chips | wire MB/step/dev | pred steps/s '
          '(4-link .. 1-link) | efficiency |')
    print('|---|---|---|---|---|---|---|')
    for N, prec, tr in configs:
        for mesh in meshes:
            try:
                r = predict(N, mesh, prec, tr)
            except Exception as e:  # audit compile failure: record, go on
                print(f'# {N} {prec} {mesh}: FAILED {e}', file=sys.stderr)
                continue
            rows.append(r)
            print(f"| {N} | {prec[-2:]} | {mesh[0]}x{mesh[1]} "
                  f"| {r['devices']} "
                  f"| {r['wire_bytes_per_device_per_step'] / 1e6:.2f} "
                  f"| {r['pred_steps_per_s_optimistic']:.0f} .. "
                  f"{r['pred_steps_per_s_pessimistic']:.0f} "
                  f"| {r['efficiency_optimistic'] * 100:.0f}% .. "
                  f"{r['efficiency_pessimistic'] * 100:.0f}% |")
            sys.stdout.flush()
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({'model': {'ici_link_gbs': ICI_LINK_GBS,
                                 'ici_links': ICI_LINKS,
                                 'single_chip_ms': {
                                     f'{k[0]}@{k[1]}': v
                                     for k, v in SINGLE_CHIP_MS.items()}},
                       'rows': rows}, f, indent=1)


if __name__ == '__main__':
    main()
