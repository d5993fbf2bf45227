"""OpenSimplex shim backed by chsimpy_tpu's own reimplementation (bit-exact
with the PyPI package for the reference's usage: noise2array, default seed)."""
import sys
if '/root/repo' not in sys.path:
    sys.path.insert(0, '/root/repo')
from chsimpy_tpu.noise import noise2array, noise2  # noqa: F401
