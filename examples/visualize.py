#!/usr/bin/env python
"""Post-hoc visualization / comparison of exported runs (the reference's
``examples/visualize.ipynb`` flow as a script): load exported CSV fields and
solution YAMLs, plot U maps and energy traces, and numerically compare two
runs with the tolerance-ladder comparators."""

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog='chsimpy-tpu-visualize')
    parser.add_argument('file_id', help='solution file id (e.g. myrun -> '
                                        'myrun.solution.U.csv[.bz2], ...)')
    parser.add_argument('--compare', help='second file id to diff against')
    parser.add_argument('--png', help='write plot to this PNG instead of '
                                      'showing')
    args = parser.parse_args(argv)

    import matplotlib
    if args.png:
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import numpy as np

    from chsimpy_tpu.io import csvio
    from chsimpy_tpu import validate

    def load(fid, member):
        for ext in ('csv', 'csv.bz2'):
            try:
                return csvio.csv_import_matrix(
                    f"{fid}.solution.{member}.{ext}")
            except OSError:
                continue
        return None

    U = load(args.file_id, 'U')
    E = load(args.file_id, 'E')
    E2 = load(args.file_id, 'E2')

    ncols = 3 if args.compare else 2
    fig, axs = plt.subplots(1, ncols, figsize=(5 * ncols, 4))
    if U is not None:
        axs[0].imshow(np.real(U), cmap='plasma', aspect='equal')
        axs[0].set_title(f'U — {args.file_id}')
    if E is not None:
        axs[1].plot(np.ravel(E), label='E')
        if E2 is not None:
            ax2 = axs[1].twinx()
            ax2.plot(np.ravel(E2), color='gray', label='E2')
        axs[1].set_title('Energy trace')
        axs[1].set_xlabel('step')

    if args.compare:
        U2 = load(args.compare, 'U')
        if U is not None and U2 is not None:
            rep = validate.compare_fields(U, U2)
            axs[2].imshow(np.real(U - U2), cmap='coolwarm', aspect='equal')
            axs[2].set_title(f"U diff vs {args.compare}\n"
                             f"checksum rel {rep['checksum_rel']:.2e}, "
                             f"max rel {rep['pointwise_max_rel']:.2e}")
            print('field comparison:', rep)

    fig.tight_layout()
    if args.png:
        fig.savefig(args.png, dpi=100)
        print(f'wrote {args.png}')
    else:
        plt.show()
    return 0


if __name__ == '__main__':
    sys.exit(main())
