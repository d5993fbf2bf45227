"""Test harness configuration.

All tests run on the CPU backend (f64 is native there — the bit-level
validation contract) with 8 virtual devices so mesh/sharding tests need no
real multi-chip hardware.  Must run before JAX initializes a backend.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import sys as _sys

# make sibling helper modules (oracle.py) importable from test files
_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
