"""Simulation parameters.

TPU-native re-design of the reference parameter model
(``chsimpy/parameters.py:17-130``): a mutable dataclass with the same ~30
fields, but the A0/A1 interaction coefficients are *data* (constant override +
multiplicative factor on the Kim & Sander fit) instead of un-serializable
lambdas, plus new TPU-specific fields (precision, mesh shape, chunking).
YAML round-trip is provided via PyYAML (reference used ruamel; file contents
stay compatible for the scalar fields).
"""

from __future__ import annotations

import copy
import dataclasses
from dataclasses import dataclass, field
from typing import Optional

from . import material
from .version import __version__


@dataclass
class Parameters:
    """Initial simulation parameters (defaults = reference defaults,
    ``chsimpy/parameters.py:21-64``)."""

    seed: int = 2023
    N: int = 512                      # [pixels] grid is N x N
    L: float = 2.0                    # [µm] domain edge length
    XXX: float = 0.875                # mean initial mole fraction of silica
    temp: float = 650.0 + 273.15      # temperature [K]
    B: float = 12.86                  # Gibbs-energy tuning parameter []
    R: float = 0.0083144626181532     # gas constant [kJ / (K mol)]
    N_A: float = 6.02214076e+23       # Avogadro constant [1/mol]

    delt: float = 3e-8                # time step
    delt_max: float = 9e-8            # max time step (adaptive mode)
    M_tilde: float = 1.71e-8          # mobility factor [µm^2/(kJ s)]
    kappa_tilde: Optional[float] = None  # None = derived via common tangent

    threshold: float = 0.875          # splits component A/B in U
    ntmax: int = int(1e6)             # max steps (early stop on energy fall)

    export_csv: Optional[str] = None  # e.g. 'U,E2'
    png: bool = False
    png_anim: bool = False
    yaml: bool = False
    no_gui: bool = False
    file_id: str = 'auto'
    full_sim: bool = False
    compress_csv: bool = False
    time_max: Optional[float] = None  # minutes of simulated time (overrides ntmax)
    generator: str = 'uniform'        # uniform | sobol | simplex | lcg
    adaptive_time: bool = False
    jitter: Optional[float] = None    # per-step noise factor in (0, 0.1)
    update_every: Optional[int] = 100
    no_diagrams: bool = False
    Uinit_file: Optional[str] = None

    # --- checkpoint/resume (TPU extension; the reference's only resume is
    # --Uinit-file, which restarts the trace — these continue it exactly) ---
    checkpoint_file: Optional[str] = None   # save full solver state here
    checkpoint_every: Optional[int] = None  # also save every ~n steps
                                            # (chunk-boundary granularity)
    restore_file: Optional[str] = None      # resume from this checkpoint

    # --- A0/A1 interaction model as data (reference: func_A0/func_A1 lambdas,
    # chsimpy/parameters.py:66-67; constant CLI overrides cli_parser.py:157-160;
    # multiplicative UQ factors experiment.py:95-99) ---
    A0_const: Optional[float] = None  # if set: A0(T) == A0_const
    A1_const: Optional[float] = None
    A0_factor: float = 1.0            # multiplies Kim & Sander A0(T)
    A1_factor: float = 1.0

    # --- TPU-native extensions (no reference equivalent) ---
    precision: str = 'float64'        # float64 (validation) | float32 (fast)
    chunk_size: int = 1024            # device steps per host round-trip
    mesh_shape: Optional[tuple] = None  # e.g. (2, 4) for a 2-D ('x','y') grid mesh
    jitter_backend: str = 'host'      # host (bit-exact RNG) | device (threefry)
    fold_field: Optional[bool] = None  # level-1 folded field layout (split
                                      # route, single device): drops the 4
                                      # level-1 reversal relayouts per step.
                                      # At equal split depth the fold is
                                      # pure data layout (U bit-identical);
                                      # the auto depth resolver picks one
                                      # more fold level under fold_field at
                                      # N>=4096 (measured faster), so the
                                      # default trajectories differ there —
                                      # pin split_levels for an A/B.  None =
                                      # auto: fold whenever the resolved
                                      # route is split on one device with
                                      # XLA kernels (measured +3.6% e2e at
                                      # N=4096 f32, capture_r3)
    split_levels: Optional[int] = None  # fold depth of the split route;
                                      # None = per-size measured resolver
                                      # (StepConfig.split_levels_resolved)
    kernel_backend: str = 'xla'       # xla | pallas
    # MXU pass count for f32 DCT matmuls; None resolves to 'high' in float32
    # mode (measured: same trace quality as 'highest' at ~1.8x speed) and
    # 'highest' in float64 mode
    matmul_precision: Optional[str] = None
    # MXU pass count for the FORWARD (nonlinear-term) transform only; the
    # semi-implicit damping Seig/CHeig makes the forward far less
    # error-sensitive than the inverse (None = same as matmul_precision)
    fwd_matmul_precision: Optional[str] = None
    # trimmed (stage1, stage2) ozaki pair cutoffs for the FORWARD f64
    # transform only (None = the contract (5, 7) both ways); same damping
    # argument as fwd_matmul_precision — see PERFORMANCE.md round 4
    ozaki_fwd_pairs: Optional[tuple] = None
    # trimmed (stage1, stage2) pair cutoffs for the INVERSE f64 ozaki
    # transform, rfold route only (None = measured default (3, 5); the
    # unfolded/folded inverse variants keep (5, 7) — resolver + measured
    # basis in core/solver.py::resolve_ozaki_inv_pairs)
    ozaki_inv_pairs: Optional[tuple] = None
    # experimental: banded-precision inverse for the matmul route —
    # spectral indices >= inv_band contract at 1-pass bf16 (the CH
    # spectrum's high-k tail is ~1e-4 of the dominant band mid-run), the
    # low band keeps matmul_precision.  None = uniform precision
    inv_band: Optional[int] = None
    # rebuild Seig/CHeig per step from the 1-D eigenvalue axis instead of
    # streaming two (N, N) grids from HBM (an HBM-bytes-for-VPU-flops
    # trade on the bandwidth-bound f32 step).  None = auto (resolver in
    # core/solver.py), 0 = off, 1 = on
    otf_coeffs: Optional[int] = None
    # MEASURED NEGATIVE, probe-only (scripts/probes/spectral_bf16_probe
    # .py): bf16-stored spectral state — no speed gain AND the carried-
    # state rounding compounds (stop step +25% at N=2048).  No CLI flag
    spectral_bf16: bool = False
    # 2-D DCT route: 'matmul' (C·U·Cᵀ on the MXU; shards under a mesh),
    # 'fft' (Makhoul rFFT, O(N² log N) — measured faster at N>=1024 f32),
    # 'auto' resolves per precision/N/mesh (see core/solver.py)
    transform_backend: str = 'auto'

    version: str = __version__

    # ------------------------------------------------------------------
    def func_A0(self, temp: float) -> float:
        """A0(T) [kJ/mol] honoring constant override and UQ factor."""
        if self.A0_const is not None:
            return float(self.A0_const)
        return material.A0(temp) * self.A0_factor

    def func_A1(self, temp: float) -> float:
        if self.A1_const is not None:
            return float(self.A1_const)
        return material.A1(temp) * self.A1_factor

    # ------------------------------------------------------------------
    def deepcopy(self) -> 'Parameters':
        return copy.deepcopy(self)

    def scalar_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d['mesh_shape'] = list(self.mesh_shape) if self.mesh_shape else None
        return d

    def is_scalarwise_equal_with(self, other: 'Parameters') -> bool:
        """Equality over scalar fields, ignoring version (reference:
        ``parameters.py:105-115``)."""
        if not isinstance(other, Parameters):
            return False
        sd, od = self.scalar_dict(), other.scalar_dict()
        sd.pop('version', None)
        od.pop('version', None)
        return sd == od

    def __str__(self):
        return str(dict(sorted(self.scalar_dict().items())))

    # ------------------------------------------------------------------
    def yaml_export_scalars(self, fname: str) -> None:
        from .io import yamlio
        yamlio.export_scalars(fname, self.scalar_dict(), tag='Parameters')

    def yaml_import_scalars(self, fname: str) -> None:
        """Load scalar fields from a YAML file (own format or reference's);
        unknown keys and callables-as-strings are skipped (reference:
        ``parameters.py:91-101``)."""
        from .io import yamlio
        data = yamlio.import_scalars(fname)
        names = {f.name for f in dataclasses.fields(self)}
        for k, v in data.items():
            if k not in names or k == 'version':
                continue
            if isinstance(v, str) and v.startswith('lambda'):
                continue
            if k == 'mesh_shape' and v is not None:
                v = tuple(v)
            setattr(self, k, v)
