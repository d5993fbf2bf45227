"""Command-line interface.

Same argument surface as the reference (``chsimpy/cli_parser.py:7-171``) —
every flag, default, range check and cross-flag error — plus TPU-native
flags (``--precision``, ``--chunk-size``, ``--mesh``, ``--jitter-backend``,
``--kernels``, ``--matmul-precision``).  Declarative: the flag table below
is the single source of truth; parsing, assignment into Parameters and
range validation are generic.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

from .params import Parameters
from .version import __version__


@dataclass(frozen=True)
class Flag:
    names: Sequence[str]            # CLI option strings
    group: str                      # argument group title
    help: str
    param: Optional[str] = None     # Parameters field to assign (None: skip)
    type: Any = None
    default: Any = None
    action: Optional[str] = None    # e.g. 'store_true'
    choices: Optional[Sequence[str]] = None
    valid_range: Optional[tuple] = None  # inclusive (lower, upper)
    kwargs: dict = field(default_factory=dict)


FLAGS = [
    # --- Simulation (reference cli_parser.py:23-86) ---
    Flag(('-N',), 'Simulation', 'Number of pixels in one domain (NxN)',
         param='N', type=int, default=512),
    Flag(('-n', '--ntmax'), 'Simulation',
         'Maximum number of simulation steps (might stop early, '
         'see --full-sim)', param='ntmax', type=int, default=int(1e6)),
    Flag(('-t', '--time-max'), 'Simulation',
         'Maximal simulated time in minutes (ignores ntmax)',
         param='time_max', type=float),
    Flag(('-z', '--full-sim'), 'Simulation',
         'Do not stop simulation early when energy falls',
         param='full_sim', action='store_true'),
    Flag(('-a', '--adaptive-time'), 'Simulation',
         'Use adaptive-time stepping (approximation, experimental)',
         param='adaptive_time', action='store_true'),
    Flag(('--cinit',), 'Simulation',
         'Initial mean mole fraction of silica',
         param='XXX', type=float, default=0.875, valid_range=(0.85, 0.95)),
    Flag(('--threshold',), 'Simulation',
         'Threshold mole fraction value to determine c_A and c_B '
         '(should match --cinit)',
         param='threshold', type=float, default=0.875,
         valid_range=(0.85, 0.95)),
    Flag(('--temperature',), 'Simulation', 'Temperature in Kelvin',
         param='temp', type=float, default=923.15),
    Flag(('--A0',), 'Simulation', 'A0 value (ignores temperature) [kJ/mol]',
         param='A0_const', type=float),
    Flag(('--A1',), 'Simulation', 'A1 value (ignores temperature) [kJ/mol]',
         param='A1_const', type=float),
    Flag(('-K', '--kappa-tilde'), 'Simulation',
         'Value for kappa_tilde [kJ/mol]', param='kappa_tilde', type=float),
    Flag(('--dt',), 'Simulation', 'Time delta of simulation',
         param='delt', type=float, default=3e-8, valid_range=(1e-12, 1e-6)),
    Flag(('-g', '--generator'), 'Simulation',
         'Generator for initial random deviations in concentration',
         param='generator', choices=['uniform', 'simplex', 'sobol', 'lcg'],
         default='uniform'),
    Flag(('-s', '--seed'), 'Simulation',
         'Start seed for random number generators',
         param='seed', type=int, default=2023),
    Flag(('-j', '--jitter'), 'Simulation',
         'Adds noise based on -g in every step by provided factor '
         '[0, 0.1) (much slower)', param='jitter', type=float),
    # --- TPU ---
    Flag(('--precision',), 'TPU',
         'float64 = validation mode (matches reference <=1e-10); '
         'float32 = fast mode',
         param='precision', choices=['float64', 'float32'],
         default='float64'),
    Flag(('--chunk-size',), 'TPU', 'Device steps per host round-trip',
         param='chunk_size', type=int, default=1024),
    Flag(('--mesh',), 'TPU',
         'Device mesh for grid sharding, e.g. "2x4" (rows x cols over '
         'jax.devices())'),
    Flag(('--jitter-backend',), 'TPU',
         'host = bit-exact RNG streamed per chunk; device = on-device '
         'draws without the per-chunk slab uploads (-g sobol: on-device '
         'scrambled Sobol, BIT-exact with the scipy stream; -g uniform: '
         'threefry, not reference-exact)',
         param='jitter_backend', choices=['host', 'device'],
         default='host'),
    Flag(('--kernels',), 'TPU',
         'Compute-path backend: XLA-fused ops or hand-tiled Pallas TPU '
         'kernels', param='kernel_backend',
         choices=['xla', 'pallas'], default='xla'),
    Flag(('--fold-field',), 'TPU',
         'Keep the field in the level-1 folded layout between transforms '
         '(split route, single device): drops 4 full-field reversal '
         'relayouts per step; stats regroup their sums (ULP-order trace '
         'shift). At equal --split-levels the U trajectory is '
         'bit-identical; the auto depth resolver folds one level deeper '
         'under --fold-field at N>=4096 (measured faster), so default '
         'trajectories differ there. Default: auto — folds whenever it '
         'composes (measured +3.6%% e2e at N=4096 f32); --no-fold-field '
         'forces the natural layout', param='fold_field',
         action=argparse.BooleanOptionalAction),
    Flag(('--split-levels',), 'TPU',
         'Fold depth of the split transform route (1-6); default: '
         'per-size measured resolver (4 at N>=4096, 5 folded, 3 at 2048, '
         'else 2). Pin it to make --fold-field a pure-layout A/B',
         param='split_levels', type=int, default=None),
    Flag(('--transform',), 'TPU',
         '2-D DCT route: matmul (MXU, shards under --mesh), split '
         '(folded matmul, ~1.5x faster on one chip at N>=1024), fft '
         '(Makhoul rFFT), ozaki (float64 via exact int8 MXU passes, the '
         'fast TPU validation transform); auto picks per precision/N/mesh',
         param='transform_backend',
         choices=['auto', 'matmul', 'split', 'fft', 'ozaki'],
         default='auto'),
    Flag(('--matmul-precision',), 'TPU',
         'MXU pass count for the float32 DCT matmuls (highest=6-pass bf16 '
         '~f32; high=3-pass ~2x faster, same measured trace quality; '
         'default resolves per precision mode)',
         param='matmul_precision',
         choices=['highest', 'high', 'default'], default=None),
    Flag(('--fwd-matmul-precision',), 'TPU',
         'MXU pass count for the FORWARD (nonlinear-term) transform only; '
         'the semi-implicit damping makes it far less error-sensitive '
         'than the inverse (unset = same as --matmul-precision)',
         param='fwd_matmul_precision',
         choices=['highest', 'high', 'default'], default=None),
    Flag(('--ozaki-fwd-pairs',), 'TPU',
         'Stage pair cutoffs "S1,S2" for the FORWARD float64 ozaki '
         'transform (default 3,5 — E at the floor with 2 slots of '
         'margin; 2,4 = fastest contract-passing; 5,7 = untrimmed)',
         param='ozaki_fwd_pairs', default=None),
    Flag(('--ozaki-inv-pairs',), 'TPU',
         'Stage pair cutoffs "S1,S2" for the INVERSE float64 ozaki '
         'transform, rfold route (default 3,5 — same measured margin '
         'structure as the forward, all exact-stop goldens hold; '
         '5,7 = untrimmed)',
         param='ozaki_inv_pairs', default=None),
    Flag(('--inv-band',), 'TPU',
         'Experimental banded-precision inverse (matmul route only): '
         'spectral rows/cols >= this index contract at 1-pass bf16, the '
         'dominant low band keeps --matmul-precision (measured verdict: '
         'PERFORMANCE.md round 5)',
         param='inv_band', type=int, default=None),
    Flag(('--otf-coeffs',), 'TPU',
         'Rebuild the Seig/CHeig update grids per step from the 1-D '
         'eigenvalue axis instead of streaming two (N,N) fields from '
         'HBM (1 = on, 0 = off; default: auto — on for the f32 split '
         'route at N>=2048, where the step is bandwidth-bound)',
         param='otf_coeffs', type=int, default=None, choices=[0, 1]),
    # --- Input (reference cli_parser.py:88-94) ---
    Flag(('-p', '--parameter-file'), 'Input',
         'Input yaml file with parameter values (overwrites CLI '
         'parameters)'),
    Flag(('--Uinit-file',), 'Input',
         'Initial U matrix file (csv or bz2 format).',
         param='Uinit_file'),
    Flag(('--restore',), 'Input',
         'Resume from a checkpoint file (see --checkpoint-file): continues '
         'the exact trajectory — field, trace, counters, RNG stream. The '
         "checkpoint's physics parameters win; run-control flags (-n, "
         '--update-every, output flags) come from this command line.',
         param='restore_file'),
    # --- Output (reference cli_parser.py:96-131) ---
    Flag(('-f', '--file-id'), 'Output',
         'Filenames have an id like "<ID>...yaml" ("auto" creates a '
         'timestamp). Existing files will be OVERWRITTEN!',
         param='file_id', default='auto'),
    Flag(('--no-gui',), 'Output',
         'Do not show plot window (if --png or --png-anim).',
         param='no_gui', action='store_true'),
    Flag(('--png',), 'Output',
         'Export solution plot to PNG image file (see --file-id).',
         param='png', action='store_true'),
    Flag(('--png-anim',), 'Output',
         'Export live plotting to series of PNGs (--update-every '
         'required) (see --file-id).', param='png_anim',
         action='store_true'),
    Flag(('--yaml',), 'Output',
         'Export parameters to yaml file (see --file-id).',
         param='yaml', action='store_true'),
    Flag(('--export-csv',), 'Output',
         'Solution matrix names to be exported to csv (e.g. ...="U,E2")',
         param='export_csv'),
    Flag(('-C', '--compress-csv'), 'Output',
         'Compress csv files with bz2',
         param='compress_csv', action='store_true'),
    Flag(('--update-every',), 'Output',
         'Every n simulation steps data is plotted or rendered (>=2) '
         '(slowdown).', param='update_every', type=int),
    Flag(('--no-diagrams',), 'Output',
         'No diagrams or axes, it only renders the image map of U.',
         param='no_diagrams', action='store_true'),
    Flag(('--checkpoint-file',), 'Output',
         'Save the full resumable solver state (npz: field, trace, '
         'counters, RNG stream position) here at the end of the run '
         '(and periodically with --checkpoint-every); resume with '
         '--restore.', param='checkpoint_file'),
    Flag(('--checkpoint-every',), 'Output',
         'Also save the checkpoint about every n steps (snapped to '
         'device-chunk boundaries).', param='checkpoint_every', type=int),
]


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
        self.parser.add_argument('--version', action='version',
                                 version=f"%(prog)s {__version__}")
        groups = {}
        for flag in FLAGS:
            if flag.group not in groups:
                groups[flag.group] = self.parser.add_argument_group(
                    flag.group)
            kw = dict(flag.kwargs)
            kw['help'] = flag.help
            if flag.action:
                kw['action'] = flag.action
            else:
                if flag.type:
                    kw['type'] = flag.type
                if flag.choices:
                    kw['choices'] = flag.choices
                kw['default'] = flag.default
            groups[flag.group].add_argument(*flag.names, **kw)
        self.args = None

    # ------------------------------------------------------------------
    def get_parameters(self, argv=None) -> Parameters:
        self.args = self.parser.parse_args(argv)
        params = Parameters()

        for flag in FLAGS:
            if flag.param is None:
                continue
            dest = flag.names[-1].lstrip('-').replace('-', '_')
            value = getattr(self.args, dest)
            if flag.valid_range is not None:
                value = self.get_if_range_ok(value, *flag.valid_range,
                                             name=dest.replace('_', '-')
                                             if dest != 'XXX' else 'cinit')
            if flag.param in ('kappa_tilde', 'A0_const', 'A1_const',
                              'temp') and value is None:
                continue  # keep the Parameters default (incl. derived kappa)
            setattr(params, flag.param, value)

        if self.args.mesh:
            try:
                params.mesh_shape = tuple(
                    int(v) for v in self.args.mesh.lower().split('x'))
            except ValueError:
                self.parser.error('--mesh must look like "2x4"')

        for pflag in ('ozaki_fwd_pairs', 'ozaki_inv_pairs'):
            raw = getattr(params, pflag)
            if isinstance(raw, str):
                flag = '--' + pflag.replace('_', '-')
                try:
                    s1, s2 = (int(v) for v in raw.split(','))
                except ValueError:
                    self.parser.error(f'{flag} must look like "3,5"')
                if not (0 <= s1 <= 7 and 0 <= s2 <= 7):
                    self.parser.error(f'{flag} cutoffs must be in [0, 7]')
                setattr(params, pflag, (s1, s2))

        # cross-flag validation (reference cli_parser.py:146-153)
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
        if params.checkpoint_every is not None \
                and params.checkpoint_file is None:
            self.parser.error('--checkpoint-every has no effect '
                              '(no --checkpoint-file given).')

        # YAML parameter file overrides CLI (reference order,
        # cli_parser.py:155-156)
        if self.args.parameter_file is not None:
            params.yaml_import_scalars(self.args.parameter_file)
        return params

    def print_info(self):
        print(f"{self.parser.prog} {__version__} "
              "('--help' for command parameters)")

    def get_if_range_ok(self, value, lower, upper, name=None):
        if lower <= value <= upper:
            return value
        name = 'value' if name is None else name
        self.parser.error(f"{name} is out of the range [{lower},{upper}].")
