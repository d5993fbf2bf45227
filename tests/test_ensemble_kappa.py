"""Per-member kappa derivation: the UQ ensemble derives kappa_tilde from
each member's perturbed (A0, A1) via the sympy common tangent — the same
recomputation the reference performs inside every worker process
(chsimpy/solution.py:39-48 invoked per run)."""

import numpy as np

import chsimpy_tpu as ct
from chsimpy_tpu import material
from chsimpy_tpu.ensemble import EnsembleSolver, derive_member_constants


def test_member_kappas_differ_and_match_single_runs():
    p = ct.Parameters()
    p.N = 16
    p.ntmax = 10
    p.no_gui = True
    p.update_every = None
    p.full_sim = True
    p.generator = 'lcg'
    p.kappa_tilde = None  # force the sympy derivation per member
    A0 = material.A0(p.temp)
    A1 = material.A1(p.temp)
    pairs = np.array([[A0, A1], [A0 * 1.005, A1 * 0.995]])
    ens = EnsembleSolver(p, pairs)
    assert ens.kappas[0] != ens.kappas[1]
    # member 0 (unperturbed) must carry the canonical kappa
    # (nsolve runs at prec=7, reference-identical setting => ~7 digits)
    np.testing.assert_allclose(ens.kappas[0], 2.98911291966116e-4,
                               rtol=1e-6)
    # per-member kappa equals what a single perturbed run derives
    ps = p.deepcopy()
    ps.A0_const = float(pairs[1, 0])
    ps.A1_const = float(pairs[1, 1])
    from chsimpy_tpu.derived import Derived
    d = Derived.from_params(ps)
    np.testing.assert_allclose(ens.kappas[1], d.kappa_tilde, rtol=1e-12)
    # and the batch actually runs with the distinct CHeig grids
    ens.prepare()
    sols = ens.solve_or_resume(10)
    assert sols[0].kappa_tilde != sols[1].kappa_tilde


def test_derive_member_constants_cache():
    p = ct.Parameters()
    p.kappa_tilde = None
    A0 = material.A0(p.temp)
    A1 = material.A1(p.temp)
    k1 = derive_member_constants(p, A0, A1)
    k2 = derive_member_constants(p, A0, A1)  # lru-cached sympy
    assert k1 == k2
