"""Native (C) components, compiled on first use and cached.

The reference has no native code; here C is used only where Python/JAX is the
wrong tool: the strictly-sequential float64 LCG recurrence (lcg.c).
"""

from .build import get_lcg_lib  # noqa: F401
