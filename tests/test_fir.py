"""FIR filter tests (intent of tests/test_fir.cpp)."""

import numpy as np
import pytest

from gsdr_tpu import fir, fir_output_length
from golden import EDGE_SIZES, fir_golden


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def test_impulse_response_is_taps(rng):
    # tests/test_fir.cpp:191-206: filtering an impulse reproduces the taps.
    taps = rng.normal(size=16).astype(np.float32)
    x = np.zeros(64, dtype=np.float32)
    x[0] = 1.0
    out = np.asarray(fir(x, taps))
    # out[i] = sum_t x[i+t] * taps[t] -> impulse at 0 hits tap 0 at i=0 only.
    np.testing.assert_allclose(out[0], taps[0], rtol=1e-6)
    # Shifted impulse walks the taps backwards (correlation semantics).
    x2 = np.zeros(64, dtype=np.float32)
    x2[5] = 1.0
    out2 = np.asarray(fir(x2, taps))
    np.testing.assert_allclose(out2[:6], taps[5::-1], rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("n", [s for s in EDGE_SIZES if s >= 16])
@pytest.mark.parametrize("decimation", [1, 2, 4])
def test_matches_golden_ff(rng, n, decimation):
    taps = rng.normal(size=16).astype(np.float32)
    x = rng.normal(size=n).astype(np.float32)
    out = np.asarray(fir(x, taps, decimation))
    expected = fir_golden(x, taps, decimation)
    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("decimation", [1, 3])
def test_matches_golden_fc(rng, decimation):
    # float taps, complex input (gsdrFirFC).
    taps = rng.normal(size=31).astype(np.float32)
    x = (rng.normal(size=512) + 1j * rng.normal(size=512)).astype(np.complex64)
    out = np.asarray(fir(x, taps, decimation))
    np.testing.assert_allclose(out, fir_golden(x, taps, decimation), rtol=1e-4, atol=1e-5)


def test_matches_golden_cc(rng):
    # complex taps, complex input (gsdrFirCC).
    taps = (rng.normal(size=8) + 1j * rng.normal(size=8)).astype(np.complex64)
    x = (rng.normal(size=200) + 1j * rng.normal(size=200)).astype(np.complex64)
    np.testing.assert_allclose(fir(x, taps, 2), fir_golden(x, taps, 2), rtol=1e-4, atol=1e-5)


def test_matches_golden_cf(rng):
    # complex taps, float input (gsdrFirCF).
    taps = (rng.normal(size=8) + 1j * rng.normal(size=8)).astype(np.complex64)
    x = rng.normal(size=100).astype(np.float32)
    out = np.asarray(fir(x, taps))
    assert np.iscomplexobj(out)
    np.testing.assert_allclose(out, fir_golden(x, taps), rtol=1e-4, atol=1e-5)


def test_output_length_contract():
    # Caller supplies (numOutputs-1)*D + T inputs (include/gsdr/fir.h:27).
    assert fir_output_length(100, 16, 4) == 22
    assert fir_output_length(16, 16, 4) == 1
    assert fir_output_length(15, 16, 1) == 0
    for n, t, d in [(100, 16, 4), (64, 16, 1), (33, 32, 2)]:
        x = np.zeros(n, np.float32)
        assert np.asarray(fir(x, np.ones(t, np.float32), d)).shape[-1] == \
            fir_output_length(n, t, d)


def test_batched_channels(rng):
    taps = rng.normal(size=16).astype(np.float32)
    x = (rng.normal(size=(4, 256)) + 1j * rng.normal(size=(4, 256))).astype(np.complex64)
    out = np.asarray(fir(x, taps, 2))
    for c in range(4):
        np.testing.assert_allclose(out[c], fir_golden(x[c], taps, 2), rtol=1e-4, atol=1e-5)


def test_moving_average_dc_gain(rng):
    taps = np.full(8, 1 / 8, np.float32)
    x = np.full(64, 3.0, np.float32)
    np.testing.assert_allclose(fir(x, taps), np.full(57, 3.0), rtol=1e-5)
