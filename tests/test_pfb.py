"""Polyphase FFT channelizer vs the generic complex-tap-bank channelizer.

The PFB must reproduce channelize() exactly (same windows, uniform grid,
critical decimation) — it is the fast path, not a different filter.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.ops.channelize import channelize
from gsdr_tpu.ops.pfb import pfb_channelize, pfb_taps_to_polyphase

RNG = np.random.default_rng(23)
FS = 1_024_000.0


def _planar(n):
    z = RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
    return ComplexArray.from_complex(z.astype(np.complex64))


def _lowpass(num_taps, cutoff_frac):
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    h = np.sinc(2 * cutoff_frac * n) * np.hamming(num_taps)
    return (h / h.sum()).astype(np.float32)


@pytest.mark.parametrize("k,q", [(16, 8), (8, 4), (64, 4)])
def test_matches_generic_channelizer(k, q):
    taps = _lowpass(k * q, 0.4 / k)
    x = _planar(k * 64 + k * q)
    got = pfb_channelize(x, taps, k)
    # generic path: channel c at +c*Fs/K => shift = -c*Fs/K, decimation K
    shifts = [-(c * FS / k) for c in range(k)]
    want = channelize(x, taps, shifts, FS, decimation=k)
    assert got.shape == want.shape
    scale = np.max(np.abs(want.to_numpy()))
    np.testing.assert_allclose(
        got.to_numpy(), want.to_numpy(), atol=2e-4 * max(scale, 1.0))


def test_tone_lands_in_its_channel():
    k, q = 16, 8
    taps = _lowpass(k * q, 0.4 / k)
    n = 1 << 14
    t = np.arange(n)
    c_target = 5
    tone = np.exp(2j * np.pi * (c_target / k) * t).astype(np.complex64)
    x = ComplexArray.from_complex(tone)
    out = pfb_channelize(x, taps, k)
    power = np.mean(np.abs(out.to_numpy()) ** 2, axis=-1)
    assert np.argmax(power) == c_target
    others = np.delete(power, c_target)
    assert power[c_target] > 100 * np.max(others)


def test_polyphase_decomposition_shape():
    poly = pfb_taps_to_polyphase(np.arange(12, dtype=np.float32), 4)
    assert poly.shape == (4, 3)
    # row r = taps[r], taps[r+K], taps[r+2K]
    np.testing.assert_array_equal(poly[1], [1.0, 5.0, 9.0])


@pytest.mark.parametrize("k,q", [(16, 8), (8, 4)])
def test_pallas_matches_xla(k, q):
    # interpret mode on CPU (conftest forces the CPU backend); HW parity
    # for the shared stacked kernel is covered by benchmarks/hw_parity.py
    taps = _lowpass(k * q, 0.4 / k)
    x = _planar(k * 256 + k * q)
    want = pfb_channelize(x, taps, k, impl="xla")
    got = pfb_channelize(x, taps, k, impl="pallas")
    assert got.shape == want.shape
    scale = np.max(np.abs(want.to_numpy()))
    np.testing.assert_allclose(
        got.to_numpy(), want.to_numpy(), atol=3e-4 * max(scale, 1.0))


def test_batch_axis():
    k, q = 8, 4
    taps = _lowpass(k * q, 0.4 / k)
    x = _planar(2 * 1024).reshape(2, 1024)
    out = pfb_channelize(x, taps, k)
    assert out.shape == (2, k, 1024 // k - q + 1)
    one = pfb_channelize(x[1], taps, k)
    np.testing.assert_allclose(out[1].to_numpy(), one.to_numpy(), atol=1e-6)
