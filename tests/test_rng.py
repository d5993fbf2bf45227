"""RNG layer tests: LCG golden vector (the bit-portability anchor, mirrors
reference tests/test.py:19-37), generator dispatch, stream semantics."""

import numpy as np
import pytest

from chsimpy_tpu import rng

LCG_GOLDEN = np.array([
    [0.5475444293336684, 0.29257702841077793, 0.3117376865408093,
     0.9844947126621821],
    [0.8031704429551821, 0.03775238992541674, 0.37862920778739695,
     0.5387215616827465],
    [0.7217314246677474, 0.7984879318617694, 0.8011069301520972,
     0.8502945903922872],
    [0.5455620291389348, 0.34767496602035824, 0.8863348965003783,
     0.8019890788951838],
    [0.9676096443867356, 0.12967026239711338, 0.008214473728190397,
     0.4722352030092083]])


def test_lcg_golden_vector_bitexact():
    sample = rng.matlab_lcg_sample(5, 4, 2023)
    assert np.array_equal(sample, LCG_GOLDEN)


def test_lcg_python_fallback_matches_native():
    a = rng.matlab_lcg_sample(37, 23, 99)
    b = rng._matlab_lcg_sample_py(37, 23, 99)
    assert np.array_equal(a, b)


def test_lcg_column_major():
    # first column continues into second column (MATLAB layout)
    s = rng.matlab_lcg_sample(3, 2, 7)
    flat = rng.matlab_lcg_sample(6, 1, 7).ravel()
    assert np.array_equal(s.T.ravel(), flat)


def test_uniform_generator_matches_numpy_pcg64():
    g = rng.FieldGenerator('uniform', 16, 2023)
    expected = np.random.Generator(np.random.PCG64(2023)).random((16, 16))
    u0 = g.initial_field(0.875)
    assert np.array_equal(u0, 0.875 + 0.875 * 0.01 * (expected - 0.5))


def test_uniform_stream_continues():
    g = rng.FieldGenerator('uniform', 8, 1)
    ref = np.random.Generator(np.random.PCG64(1))
    a = ref.random((8, 8))
    b = ref.random((8, 8))
    assert np.array_equal(g.next_sample(), a)
    assert np.array_equal(g.next_sample(), b)


def test_sobol_generator():
    scipy = pytest.importorskip('scipy')
    from scipy.stats import qmc
    g = rng.FieldGenerator('sobol', 8, 2023)
    q = qmc.Sobol(d=8, seed=2023)
    expected = 0.875 + 0.875 * 0.01 * (q.random(8) - 0.5)
    assert np.array_equal(g.initial_field(0.875), expected)


def test_simplex_generator_deterministic():
    g1 = rng.FieldGenerator('simplex', 16, 2023)
    g2 = rng.FieldGenerator('simplex', 16, 999)  # seed ignored (unseeded in ref)
    assert np.array_equal(g1.next_sample(), g2.next_sample())
    f = g1.next_sample()
    assert f.shape == (16, 16)
    assert np.all(np.abs(f) <= 1.0)


def test_lcg_has_no_stream():
    g = rng.FieldGenerator('lcg', 8, 2023)
    u0 = g.initial_field(0.875)
    assert u0.shape == (8, 8)
    with pytest.raises(ValueError):
        g.next_sample()


def test_unknown_generator():
    with pytest.raises(ValueError):
        rng.FieldGenerator('nope', 8, 1)


def test_device_sobol_stream_bitexact():
    """ops/sobol.py closed form vs the scipy engine: any window of the
    scrambled sequence, including across fast_forward, bit-for-bit."""
    import jax
    import jax.numpy as jnp
    from scipy.stats import qmc

    from chsimpy_tpu.ops import sobol as sobol_ops

    N, seed = 16, 2023
    sv, shift = sobol_ops.sobol_tables(N, seed)
    svj, shj = jnp.asarray(sv), jnp.asarray(shift)
    fn = jax.jit(lambda s: sobol_ops.sobol_points(svj, shj, s, N))

    e = qmc.Sobol(d=N, seed=seed)
    ref = e.random(64)  # 64 points = 4 windows of N
    for w in range(4):
        dev = np.asarray(fn(jnp.asarray(w * N, jnp.uint32)))
        np.testing.assert_array_equal(dev, ref[w * N:(w + 1) * N])

    # across a fast_forward (the checkpoint-restore path)
    e2 = qmc.Sobol(d=N, seed=seed)
    e2.fast_forward(37)
    np.testing.assert_array_equal(
        np.asarray(fn(jnp.asarray(37, jnp.uint32))), e2.random(N))
