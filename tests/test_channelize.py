"""Fused complex-tap-bank channelizer vs the op-by-op composition.

The algebraic identity under test (ops/channelize.py): folding the LO into
the taps and rotating per decimated output must equal freq_shift -> fir ->
decimate exactly (up to f32 reassociation).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gsdr_tpu import fir, freq_shift
from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.ops.channelize import channelize

RNG = np.random.default_rng(42)
FS = 1_000_000.0


def _planar(n):
    z = RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
    return ComplexArray.from_complex(z.astype(np.complex64))


def _lowpass(num_taps, cutoff_frac):
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    h = np.sinc(2 * cutoff_frac * n) * np.hamming(num_taps)
    return (h / h.sum()).astype(np.float32)


@pytest.mark.parametrize("dec", [1, 2, 4])
@pytest.mark.parametrize("n0", [0, 123_457])
def test_matches_mix_then_fir(dec, n0):
    n, taps_n = 4096, 33
    x = _planar(n)
    taps = _lowpass(taps_n, 0.1)
    shifts = [12_345.0, -200_000.0, 0.0, 499_999.0]
    got = channelize(x, taps, shifts, FS, decimation=dec,
                     first_sample_index=n0)
    for c, f in enumerate(shifts):
        mixed = freq_shift(x, f, FS, first_sample_index=n0)
        want = fir(mixed, jnp.asarray(taps), dec)
        np.testing.assert_allclose(
            got[c].to_numpy(), want.to_numpy(), atol=5e-4,
            err_msg=f"channel {c} shift {f}",
        )


def test_batch_axis():
    x = _planar(1024).reshape(1, 1024)
    x2 = ComplexArray(jnp.tile(x.re, (3, 1)), jnp.tile(x.im, (3, 1)))
    taps = _lowpass(17, 0.2)
    got = channelize(x2, taps, [50_000.0], FS, decimation=2)
    assert got.shape == (3, 1, (1024 - 17) // 2 + 1)
    one = channelize(x2[0], taps, [50_000.0], FS, decimation=2)
    np.testing.assert_allclose(got[0].to_numpy(), one.to_numpy(), atol=1e-6)


def test_non_integral_shift():
    x = _planar(2048)
    taps = _lowpass(17, 0.2)
    got = channelize(x, taps, [12_345.678], FS, decimation=1)
    mixed = freq_shift(x, 12_345.678, FS)
    want = fir(mixed, jnp.asarray(taps), 1)
    np.testing.assert_allclose(got[0].to_numpy(), want.to_numpy(), atol=5e-4)
