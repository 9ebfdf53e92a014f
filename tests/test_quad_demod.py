"""Quadrature demodulator tests (intent of tests/test_quad_demod.cpp)."""

import numpy as np
import pytest

from gsdr_tpu import quad_am_demod, quad_fm_demod


def test_fm_constant_frequency_constant_output():
    # tests/test_quad_demod.cpp:99-115: constant-frequency input gives a
    # constant discriminator output proportional to the frequency.
    fs, f = 1_000_000.0, 50_000.0
    n = np.arange(4097)
    x = np.exp(2j * np.pi * f * n / fs).astype(np.complex64)
    gain = 1.0
    out = np.asarray(quad_fm_demod(x, gain))
    expected = 2 * np.pi * f / fs
    np.testing.assert_allclose(out, expected, rtol=1e-3)


def test_fm_zero_input_zero_output():
    # tests/test_quad_demod.cpp:248-263 (atan2(0, 0) == 0).
    out = np.asarray(quad_fm_demod(np.zeros(128, np.complex64), 2.0))
    np.testing.assert_array_equal(out, np.zeros(127, np.float32))


def test_fm_gain_scaling():
    fs, f = 48_000.0, 1_000.0
    n = np.arange(257)
    x = np.exp(2j * np.pi * f * n / fs).astype(np.complex64)
    o1 = np.asarray(quad_fm_demod(x, 1.0))
    o3 = np.asarray(quad_fm_demod(x, 3.0))
    np.testing.assert_allclose(o3, 3.0 * o1, rtol=1e-5)


def test_fm_output_length():
    # numOut outputs need numOut+1 inputs (include/gsdr/quad_demod.h:25-29).
    assert np.asarray(quad_fm_demod(np.ones(100, np.complex64), 1.0)).shape == (99,)


def test_am_envelope():
    # out = 2*clamp(|x|, 0, 1) - 1 (src/quad_demod.cu:46-49).
    mags = np.array([0.0, 0.25, 0.5, 1.0, 1.5, 3.0], dtype=np.float32)
    x = (mags * np.exp(1j * 0.7)).astype(np.complex64)
    expected = 2 * np.clip(mags, 0, 1) - 1
    np.testing.assert_allclose(quad_am_demod(x), expected, rtol=1e-5, atol=1e-6)


def test_am_zero_input():
    out = np.asarray(quad_am_demod(np.zeros(64, np.complex64)))
    np.testing.assert_allclose(out, -1.0)


def test_am_modulated_signal_recovers_envelope():
    # Variance-under-modulation check (tests/test_am.cpp:107-134 intent).
    fs, fc, fm = 1_000_000.0, 100_000.0, 1_000.0
    n = np.arange(1 << 14)
    env = 0.5 + 0.4 * np.cos(2 * np.pi * fm * n / fs)
    x = (env * np.exp(2j * np.pi * fc * n / fs)).astype(np.complex64)
    out = np.asarray(quad_am_demod(x))
    np.testing.assert_allclose(out, 2 * env - 1, atol=1e-3)
