"""On-demand compilation of the native helpers via ctypes + cc.

Build artifacts are cached next to the sources (keyed by source mtime), so
the first import pays ~100ms of cc and later imports just dlopen.  Falls
back cleanly (returns None) when no compiler is available; callers must
handle that (rng.py has a pure-NumPy path with identical semantics).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_LCG_SRC = os.path.join(_HERE, 'lcg.c')

_lcg_lib = None
_lcg_tried = False


def _build(src: str, out: str) -> bool:
    # -ffp-contract=off is load-bearing: see lcg.c header comment.
    cmd = ['cc', '-O2', '-shared', '-fPIC', '-ffp-contract=off',
           '-fno-fast-math', src, '-o', out, '-lm']
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lcg_lib():
    """Return the compiled LCG ctypes library, or None if unavailable."""
    global _lcg_lib, _lcg_tried
    if _lcg_tried:
        return _lcg_lib
    _lcg_tried = True
    so_path = os.path.join(_HERE, '_lcg_native.so')
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_LCG_SRC)):
            # build into a temp file first so concurrent processes never
            # dlopen a half-written .so
            fd, tmp = tempfile.mkstemp(suffix='.so', dir=_HERE)
            os.close(fd)
            if _build(_LCG_SRC, tmp):
                os.replace(tmp, so_path)
            else:
                os.unlink(tmp)
                return None
        lib = ctypes.CDLL(so_path)
        lib.lcg_fill_colmajor.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double]
        lib.lcg_fill_colmajor.restype = None
        _lcg_lib = lib
    except OSError:
        _lcg_lib = None
    return _lcg_lib
