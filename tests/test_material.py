"""Material model against the constants the reference derives for the
default configuration (documented in BASELINE.md, computed via
chsimpy/solution.py:25-55 and chsimpy/utils.py:143-180)."""

import numpy as np

from chsimpy_tpu import material
from chsimpy_tpu.derived import Derived
from chsimpy_tpu.params import Parameters

R = 0.0083144626181532
T = 923.15
B = 12.86


def test_A0_A1_defaults():
    assert np.isclose(material.A0(T), -151.26151, atol=1e-5)
    assert np.isclose(material.A1(T), -85.612615, atol=1e-6)


def test_kappa_base_and_tilde():
    d = Derived.from_params(Parameters())
    assert np.isclose(d.kappa_base, 0.0314436558796025, rtol=1e-10)
    assert np.isclose(d.kappa_tilde, 2.98911291966116e-4, rtol=1e-10)


def test_miscibility_gap():
    ca, cb = material.get_miscibility_gap(R, T, B,
                                          material.A0(T), material.A1(T))
    assert np.isclose(ca, 0.8121353, atol=1e-6)
    assert np.isclose(cb, 0.9723917, atol=1e-6)


def test_spinodal_roots():
    roots = material.get_roots_of_EPP(R, T, material.A0(T), material.A1(T))
    assert len(roots) == 2
    sa, sb = sorted(roots)
    assert np.isclose(sa, 0.854592, atol=1e-5)
    assert np.isclose(sb, 0.949088, atol=1e-5)


def test_derived_constants_default():
    p = Parameters()
    d = Derived.from_params(p)
    assert np.isclose(d.delx, 2 / 511, rtol=1e-15)
    assert np.isclose(d.RT, R * T, rtol=1e-15)
    assert np.isclose(d.A0, -151.26151, atol=1e-5)
    # kappa = kappa_tilde / Am
    assert np.isclose(d.kappa, d.kappa_tilde * d.Amr, rtol=1e-15)


def test_constant_A_override():
    p = Parameters()
    p.A0_const = -100.0
    p.A1_const = -50.0
    assert p.func_A0(1000.0) == -100.0
    assert p.func_A1(1000.0) == -50.0


def test_A_factor():
    p = Parameters()
    p.A0_factor = 1.005
    assert np.isclose(p.func_A0(T), material.A0(T) * 1.005, rtol=1e-15)
