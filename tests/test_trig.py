"""Oscillator generator tests (intent of tests/test_trig.cpp)."""

import numpy as np
import pytest

from gsdr_tpu import cosine_c, cosine_f


def _theta(phi_begin, phi_end, n):
    step = (phi_end - phi_begin) / n
    return phi_begin + np.arange(n) * step


@pytest.mark.parametrize("n", [1, 16, 33, 1024, 1025])
def test_cosine_f(n):
    phi0, phi1 = 0.25, 7.75
    out = np.asarray(cosine_f(phi0, phi1, n))
    np.testing.assert_allclose(out, np.cos(_theta(phi0, phi1, n)), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n", [1, 64, 1023])
def test_cosine_c(n):
    phi0, phi1 = -1.5, 12.0
    out = np.asarray(cosine_c(phi0, phi1, n))
    th = _theta(phi0, phi1, n)
    np.testing.assert_allclose(out.real, np.cos(th), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out.imag, np.sin(th), rtol=1e-4, atol=1e-5)


def test_unit_magnitude():
    out = np.asarray(cosine_c(0.0, 20 * np.pi, 4096))
    np.testing.assert_allclose(np.abs(out), 1.0, atol=1e-5)


def test_frequency_content():
    # A full-cycle ramp produces exactly k cycles.
    k, n = 8, 256
    out = np.asarray(cosine_c(0.0, 2 * np.pi * k, n))
    spec = np.abs(np.fft.fft(out))
    assert np.argmax(spec) == k
