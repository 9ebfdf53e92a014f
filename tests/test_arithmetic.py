"""Elementwise arithmetic parity tests (intent of tests/test_arithmetic.cpp)."""

import numpy as np
import pytest

from gsdr_tpu import absolute, add_const, add_to_magnitude, magnitude, multiply
from golden import EDGE_SIZES


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


@pytest.mark.parametrize("n", EDGE_SIZES)
def test_add_const_ff(rng, n):
    x = rng.normal(size=n).astype(np.float32)
    np.testing.assert_allclose(add_const(x, 2.5), x + 2.5, rtol=1e-6)


@pytest.mark.parametrize("n", [1, 33, 1024])
def test_add_const_cc(rng, n):
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    c = 0.5 - 0.25j
    np.testing.assert_allclose(add_const(x, c), x + c, rtol=1e-6)


def test_add_const_cf_adds_to_real_only(rng):
    # Reference CF overload adds to the real part only
    # (src/cuComplexOperatorOverloads.cuh:51-53).
    x = (rng.normal(size=64) + 1j * rng.normal(size=64)).astype(np.complex64)
    out = np.asarray(add_const(x, 1.5))
    np.testing.assert_allclose(out.real, x.real + 1.5, rtol=1e-6)
    np.testing.assert_allclose(out.imag, x.imag, rtol=1e-6)


def test_add_const_fc_promotes(rng):
    x = rng.normal(size=64).astype(np.float32)
    out = np.asarray(add_const(x, 1.0 + 2.0j))
    assert np.iscomplexobj(out)
    np.testing.assert_allclose(out, x + (1.0 + 2.0j), rtol=1e-6)


@pytest.mark.parametrize("n", [1, 32, 1025])
def test_multiply_cc(rng, n):
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    y = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    np.testing.assert_allclose(multiply(x, y), x * y, rtol=1e-5, atol=1e-6)


def test_multiply_ff_and_cf(rng):
    f1 = rng.normal(size=128).astype(np.float32)
    f2 = rng.normal(size=128).astype(np.float32)
    np.testing.assert_allclose(multiply(f1, f2), f1 * f2, rtol=1e-6)
    c = (rng.normal(size=128) + 1j * rng.normal(size=128)).astype(np.complex64)
    np.testing.assert_allclose(multiply(c, f2), c * f2, rtol=1e-5, atol=1e-6)


def test_magnitude_and_abs(rng):
    c = (rng.normal(size=256) + 1j * rng.normal(size=256)).astype(np.complex64)
    np.testing.assert_allclose(magnitude(c), np.abs(c), rtol=1e-5)
    f = rng.normal(size=256).astype(np.float32)
    np.testing.assert_allclose(absolute(f), np.abs(f), rtol=1e-6)


def test_add_to_magnitude_preserves_phase(rng):
    c = (rng.normal(size=256) + 1j * rng.normal(size=256)).astype(np.complex64)
    k = 0.75
    out = np.asarray(add_to_magnitude(c, k))
    np.testing.assert_allclose(np.abs(out), np.abs(c) + k, rtol=1e-5)
    np.testing.assert_allclose(np.angle(out), np.angle(c), rtol=1e-4, atol=1e-5)


def test_add_to_magnitude_zero_input_defined():
    out = np.asarray(add_to_magnitude(np.zeros(8, np.complex64), 0.5))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, np.full(8, 0.5 + 0j, np.complex64))


def test_batched_leading_axes(rng):
    x = (rng.normal(size=(3, 5, 64)) + 1j * rng.normal(size=(3, 5, 64))).astype(np.complex64)
    assert np.asarray(magnitude(x)).shape == (3, 5, 64)


def test_determinism(rng):
    # tests/test_conversion.cpp:161-178 intent: repeated runs identical.
    x = (rng.normal(size=1024) + 1j * rng.normal(size=1024)).astype(np.complex64)
    a = np.asarray(add_to_magnitude(x, 0.3))
    b = np.asarray(add_to_magnitude(x, 0.3))
    np.testing.assert_array_equal(a, b)
