"""QPSK modem tests (intent of tests/test_qpsk.cpp)."""

import numpy as np
import pytest

from gsdr_tpu import (
    qpsk_constellation,
    qpsk_demodulate,
    qpsk_modulate,
    pack_2bit_symbols,
    unpack_2bit_symbols,
)
from golden import awgn


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(23)


def test_constellation_mapping():
    # src/qpsk.cu:102-106: 00->(+A,+A) 01->(-A,+A) 11->(-A,-A) 10->(+A,-A).
    a = 2.0
    table = np.asarray(qpsk_constellation(a))
    np.testing.assert_allclose(table[0b00], a + a * 1j)
    np.testing.assert_allclose(table[0b01], -a + a * 1j)
    np.testing.assert_allclose(table[0b11], -a - a * 1j)
    np.testing.assert_allclose(table[0b10], a - a * 1j)


def test_bit_packing_lsb_first():
    # 2-bit fields LSB-first, 4 symbols/byte (src/qpsk.cu:121-123).
    syms = np.array([0b00, 0b01, 0b10, 0b11], np.uint8)
    packed = np.asarray(pack_2bit_symbols(syms))
    assert packed.shape == (1,)
    assert packed[0] == 0b11_10_01_00
    np.testing.assert_array_equal(np.asarray(unpack_2bit_symbols(packed)), syms)


def test_loopback_bit_exact(rng):
    # tests/test_qpsk.cpp:101-112: ideal-channel round trip is bit-exact.
    n_bytes = 1024
    data = rng.integers(0, 256, size=n_bytes, dtype=np.uint8)
    symbols = qpsk_modulate(data, amplitude=1.0)
    recovered = np.asarray(qpsk_demodulate(symbols))
    np.testing.assert_array_equal(recovered, data)


def test_amplitude_scaling(rng):
    # tests/test_qpsk.cpp:114-136: |symbol| == A*sqrt(2).
    data = rng.integers(0, 256, size=64, dtype=np.uint8)
    for a in [0.5, 1.0, 3.0]:
        s = np.asarray(qpsk_modulate(data, amplitude=a))
        np.testing.assert_allclose(np.abs(s), a * np.sqrt(2), rtol=1e-5)


def test_exactly_four_unique_points(rng):
    # tests/test_qpsk.cpp:138-170.
    data = rng.integers(0, 256, size=4096, dtype=np.uint8)
    s = np.asarray(qpsk_modulate(data))
    pts = np.unique(np.round(s, 5))
    assert len(pts) == 4


def test_ber_under_awgn_at_10db(rng):
    # tests/test_qpsk.cpp:172-210: BER < 1% at 10 dB SNR.
    n_bytes = 1 << 14
    data = rng.integers(0, 256, size=n_bytes, dtype=np.uint8)
    s = np.asarray(qpsk_modulate(data))
    noisy = awgn(rng, s, snr_db=10.0).astype(np.complex64)
    rec = np.asarray(qpsk_demodulate(noisy))
    bit_errors = np.unpackbits(rec ^ data).sum()
    ber = bit_errors / (n_bytes * 8)
    assert ber < 0.01


def test_multi_stream_channel_axis(rng):
    # The 2x/4x/8x & Templated<N> API families (src/qpsk.cu:148-219,500-585)
    # as a leading axis.
    data = rng.integers(0, 256, size=(8, 256), dtype=np.uint8)
    s = qpsk_modulate(data)
    assert np.asarray(s).shape == (8, 1024)
    rec = np.asarray(qpsk_demodulate(s))
    np.testing.assert_array_equal(rec, data)


def test_partial_symbol_count(rng):
    # num_symbols not a multiple of 4 (partial trailing byte).
    data = rng.integers(0, 256, size=4, dtype=np.uint8)
    s = qpsk_modulate(data, num_symbols=13)
    assert np.asarray(s).shape == (13,)
    rec = np.asarray(qpsk_demodulate(s))
    # First 3 bytes exact; final byte's low 2-bit field matches.
    np.testing.assert_array_equal(rec[:3], data[:3])
    assert rec[3] & 0x3 == data[3] & 0x3
