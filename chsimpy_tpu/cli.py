"""Command-line interface.

Same argument surface as the reference (``chsimpy/cli_parser.py:7-171``) —
every flag, default, range check and cross-flag error — plus TPU-native
flags: ``--precision``, ``--chunk-size``, ``--mesh``, ``--jitter-backend``.
"""

from __future__ import annotations

import argparse

from .params import Parameters
from .version import __version__


class CLIParser:
    def __init__(self, progname='chsimpy-tpu'):
        self.parser = argparse.ArgumentParser(
            prog=progname,
            description='TPU-native simulation of Phase Separation in '
                        'Na2O-SiO2 Glasses under Uncertainty (solving the '
                        'Cahn-Hilliard (CH) equation with JAX/XLA)',
            formatter_class=argparse.ArgumentDefaultsHelpFormatter,
            add_help=True,
        )
        parser = self.parser
        parser.add_argument('--version', action='version',
                            version=f"%(prog)s {__version__}")

        group = parser.add_argument_group('Simulation')
        group.add_argument('-N', default=512, type=int,
                           help='Number of pixels in one domain (NxN)')
        group.add_argument('-n', '--ntmax', default=int(1e6), type=int,
                           help='Maximum number of simulation steps '
                                '(might stop early, see --full-sim)')
        group.add_argument('-t', '--time-max', type=float,
                           help='Maximal simulated time in minutes '
                                '(ignores ntmax)')
        group.add_argument('-z', '--full-sim', action='store_true',
                           help='Do not stop simulation early when '
                                'energy falls')
        group.add_argument('-a', '--adaptive-time', action='store_true',
                           help='Use adaptive-time stepping '
                                '(approximation, experimental)')
        group.add_argument('--cinit', type=float, default=0.875,
                           help='Initial mean mole fraction of silica')
        group.add_argument('--threshold', type=float, default=0.875,
                           help='Threshold mole fraction value to determine '
                                'c_A and c_B (should match --cinit)')
        group.add_argument('--temperature', type=float, default=923.15,
                           help='Temperature in Kelvin')
        group.add_argument('--A0', type=float,
                           help='A0 value (ignores temperature) [kJ/mol]')
        group.add_argument('--A1', type=float,
                           help='A1 value (ignores temperature) [kJ/mol]')
        group.add_argument('-K', '--kappa-tilde', type=float,
                           help='Value for kappa_tilde [kJ/mol]')
        group.add_argument('--dt', type=float, default=3e-8,
                           help='Time delta of simulation')
        group.add_argument('-g', '--generator',
                           choices=['uniform', 'simplex', 'sobol', 'lcg'],
                           default='uniform',
                           help='Generator for initial random deviations '
                                'in concentration')
        group.add_argument('-s', '--seed', default=2023, type=int,
                           help='Start seed for random number generators')
        group.add_argument('-j', '--jitter', type=float,
                           help='Adds noise based on -g in every step by '
                                'provided factor [0, 0.1) (much slower)')

        group = parser.add_argument_group('TPU')
        group.add_argument('--precision',
                           choices=['float64', 'float32'],
                           default='float64',
                           help='float64 = validation mode (matches '
                                'reference <=1e-10); float32 = fast mode')
        group.add_argument('--chunk-size', type=int, default=1024,
                           help='Device steps per host round-trip')
        group.add_argument('--mesh', default=None,
                           help='Device mesh for grid sharding, e.g. "2x4" '
                                '(rows x cols over jax.devices())')
        group.add_argument('--jitter-backend',
                           choices=['host', 'device'], default='host',
                           help='host = bit-exact RNG streamed per chunk; '
                                'device = fast on-device threefry '
                                '(not bit-exact with the reference)')
        group.add_argument('--kernels', choices=['xla', 'pallas'],
                           default='xla',
                           help='Compute-path backend: XLA-fused ops or '
                                'hand-tiled Pallas TPU kernels')
        group.add_argument('--matmul-precision',
                           choices=['highest', 'high', 'default'],
                           default=None,
                           help='MXU pass count for the float32 DCT matmuls '
                                '(highest=6-pass bf16 ~f32; high=3-pass '
                                '~2x faster, same measured trace quality; '
                                'default resolves per precision mode)')

        group = parser.add_argument_group('Input')
        group.add_argument('-p', '--parameter-file',
                           help='Input yaml file with parameter values '
                                '(overwrites CLI parameters)')
        group.add_argument('--Uinit-file',
                           help='Initial U matrix file (csv or bz2 format).')

        group = parser.add_argument_group('Output')
        group.add_argument('-f', '--file-id', default='auto',
                           help='Filenames have an id like "<ID>...yaml" '
                                '("auto" creates a timestamp). Existing '
                                'files will be OVERWRITTEN!')
        group.add_argument('--no-gui', action='store_true',
                           help='Do not show plot window '
                                '(if --png or --png-anim).')
        group.add_argument('--png', action='store_true',
                           help='Export solution plot to PNG image file '
                                '(see --file-id).')
        group.add_argument('--png-anim', action='store_true',
                           help='Export live plotting to series of PNGs '
                                '(--update-every required) (see --file-id).')
        group.add_argument('--yaml', action='store_true',
                           help='Export parameters to yaml file '
                                '(see --file-id).')
        group.add_argument('--export-csv',
                           help='Solution matrix names to be exported to '
                                'csv (e.g. ...="U,E2")')
        group.add_argument('-C', '--compress-csv', action='store_true',
                           help='Compress csv files with bz2')
        group.add_argument('--update-every', type=int,
                           help='Every n simulation steps data is plotted '
                                'or rendered (>=2) (slowdown).')
        group.add_argument('--no-diagrams', action='store_true',
                           help='No diagrams or axes, it only renders the '
                                'image map of U.')
        self.args = None

    # ------------------------------------------------------------------
    def get_parameters(self, argv=None) -> Parameters:
        self.args = self.parser.parse_args(argv)
        args = self.args
        params = Parameters()

        params.ntmax = args.ntmax
        params.N = args.N
        params.file_id = args.file_id
        params.seed = args.seed
        params.full_sim = args.full_sim
        if args.kappa_tilde is not None:
            params.kappa_tilde = args.kappa_tilde
        params.compress_csv = args.compress_csv
        params.export_csv = args.export_csv
        params.png = args.png
        params.png_anim = args.png_anim
        params.yaml = args.yaml
        params.no_gui = args.no_gui
        params.adaptive_time = args.adaptive_time
        params.time_max = args.time_max
        params.generator = args.generator
        params.jitter = args.jitter
        params.update_every = args.update_every
        params.no_diagrams = args.no_diagrams
        params.Uinit_file = args.Uinit_file
        params.XXX = self.get_if_range_ok(args.cinit, 0.85, 0.95, 'cinit')
        params.threshold = self.get_if_range_ok(args.threshold, 0.85, 0.95,
                                                'threshold')
        params.delt = self.get_if_range_ok(args.dt, 1e-12, 1e-6, 'dt')
        if args.temperature is not None:
            params.temp = args.temperature

        params.precision = args.precision
        params.chunk_size = args.chunk_size
        params.jitter_backend = args.jitter_backend
        params.kernel_backend = args.kernels
        params.matmul_precision = args.matmul_precision
        if args.mesh:
            try:
                params.mesh_shape = tuple(
                    int(v) for v in args.mesh.lower().split('x'))
            except ValueError:
                self.parser.error('--mesh must look like "2x4"')

        if params.update_every is not None and params.update_every < 2:
            self.parser.error('--update-every should be >=2')
        if params.png_anim and params.update_every is None:
            self.parser.error('--png-anim requires --update-every.')
        if params.export_csv is not None and (
                params.export_csv == ''
                or params.export_csv.lower() == 'none'):
            self.parser.error('--export-csv does not contain valid entries.')
        if params.compress_csv and params.export_csv is None:
            self.parser.error('--compress-csv has no effect '
                              '(no --export-csv given).')

        if args.parameter_file is not None:
            params.yaml_import_scalars(args.parameter_file)
        if args.A0 is not None:
            params.A0_const = args.A0
        if args.A1 is not None:
            params.A1_const = args.A1
        return params

    def print_info(self):
        print(f"{self.parser.prog} {__version__} "
              "('--help' for command parameters)")

    def get_if_range_ok(self, value, lower, upper, name=None):
        if lower <= value <= upper:
            return value
        name = 'value' if name is None else name
        self.parser.error(f"{name} is out of the range [{lower},{upper}].")
