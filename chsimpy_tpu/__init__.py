"""chsimpy_tpu — TPU-native Cahn-Hilliard phase-separation engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference ``chsimpy`` package (Na2O-SiO2 phase separation under uncertainty,
semi-implicit spectral DCT method): same physics, CLI, exporters, UQ
experiment driver and visualization — redesigned for TPU (MXU matmul DCTs,
on-device while-loop stepping, pjit grid sharding, vmapped ensembles).
"""

import os as _os

import jax as _jax

# float64 is part of the validation contract (<=1e-10 energy traces vs the
# reference); fast mode selects float32 arrays per run via Parameters.precision.
_jax.config.update('jax_enable_x64', True)

def honor_jax_platforms_env():
    """Re-apply the JAX_PLATFORMS environment variable via the config API.

    Platform plugins (e.g. the axon TPU tunnel) can override the env-var
    lookup, silently sending `JAX_PLATFORMS=cpu` runs to the TPU.  The CLI
    entry points call this; library embedders keep full control of the jax
    config (importing the package does NOT touch platform selection)."""
    env_platforms = _os.environ.get('JAX_PLATFORMS')
    if env_platforms:
        try:
            _jax.config.update('jax_platforms', env_platforms)
        except Exception:
            pass  # backend already initialized by the embedding process

# persistent compilation cache: TPU compiles of the chunked while-loop are
# expensive; cache them across processes/rounds
_cache_dir = _os.environ.get(
    'CHSIMPY_TPU_COMPILE_CACHE',
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                  '..', '.xla_cache'))
if _cache_dir and _cache_dir.lower() != 'off':
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update('jax_compilation_cache_dir', _cache_dir)
        _jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        # cache EVERY program, however fast its compile: on the remote
        # (tunnel) backend even a trivial jit costs a ~0.45 s service
        # round-trip, and ensemble setup runs ~33 of them — a 1.0 s
        # threshold made every fresh process re-pay ~15 s (measured,
        # artifacts/r4/uq_hostpipe_ab.json notes)
        _jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass

from .params import Parameters  # noqa: E402,F401
from .solution import Solution  # noqa: E402,F401
from .timedata import TimeData  # noqa: E402,F401
from .core.solver import Solver  # noqa: E402,F401
from .simulator import Simulator  # noqa: E402,F401
from .cli import CLIParser  # noqa: E402,F401
from .version import __version__  # noqa: E402,F401

__all__ = ['Parameters', 'Solution', 'TimeData', 'Solver', 'Simulator',
           'CLIParser', '__version__']
