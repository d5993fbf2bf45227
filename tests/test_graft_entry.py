"""The driver entry points must stay green: single-chip compile check and
the multi-chip dry run on the virtual 8-device mesh."""

import os
import sys

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def test_entry_compiles_and_steps():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert int(out.computed_steps) == 5  # 1 (prepare) + 4 iters
    assert int(out.stop_reason) == 0


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
