"""Pole-diagonalized Pallas IIR kernel vs the exact blocked-scan golden.

Interpreter mode on CPU (tests/conftest.py forces the CPU backend); the
kernel's semantics are validated here, its throughput on hardware by
benchmarks/run_all.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gsdr_tpu.kernels.iir_pallas import (
    diagonalize,
    iir_pallas,
    iir_pallas_supported,
)
from gsdr_tpu.ops.iir import iir_block, iir_reference

RNG = np.random.default_rng(23)


def butter2(fc):
    c = 1.0 / np.tan(np.pi * fc)
    sq2 = np.sqrt(2.0)
    a0 = c * c + sq2 * c + 1.0
    b = np.array([1.0, 2.0, 1.0]) / a0
    a = np.array([1.0, 2.0 * (1.0 - c * c) / a0, (c * c - sq2 * c + 1.0) / a0])
    return b, a


def deemph(tau=75e-6, fs=250e3):
    k = np.tan(1.0 / (2.0 * tau * fs))
    b0 = k / (1.0 + k)
    return np.array([b0, b0]), np.array([1.0, (k - 1.0) / (k + 1.0)])


FILTERS = {
    "first_order_deemph": deemph(),
    "biquad_complex_poles": butter2(0.1),
    "biquad_wide": butter2(0.35),
    # two distinct real poles
    "real_poles": (np.array([1.0, 0.3, 0.02]),
                   np.poly(np.array([0.5, -0.3]))),
    # 4th order: two complex pairs (cascade product expanded)
    "fourth_order": (
        np.convolve(butter2(0.08)[0], butter2(0.22)[0]),
        np.convolve(butter2(0.08)[1], butter2(0.22)[1]),
    ),
    # odd order: one real pole + complex pair
    "third_order": (
        np.convolve(deemph()[0], butter2(0.15)[0]),
        np.convolve(deemph()[1], butter2(0.15)[1]),
    ),
}


@pytest.mark.parametrize("name", sorted(FILTERS))
def test_matches_exact_scan(name):
    b, a = FILTERS[name]
    assert iir_pallas_supported(b, a), name
    x = RNG.standard_normal(5000).astype(np.float32)
    want = np.asarray(iir_reference(b.astype(np.float32),
                                    a.astype(np.float32), x))
    got, _ = iir_pallas(b, a, x, block_n=256, interpret=True)
    got = np.asarray(got)
    scale = np.max(np.abs(want)) + 1e-12
    assert np.max(np.abs(got - want)) / scale < 2e-4, name


@pytest.mark.parametrize("n", [1, 7, 128, 1000, 2048, 5000])
def test_edge_sizes(n):
    b, a = FILTERS["biquad_complex_poles"]
    x = RNG.standard_normal(n).astype(np.float32)
    want = np.asarray(iir_reference(b.astype(np.float32),
                                    a.astype(np.float32), x))
    got, _ = iir_pallas(b, a, x, block_n=256, interpret=True)
    scale = np.max(np.abs(want)) + 1e-9
    assert np.max(np.abs(np.asarray(got) - want)) / scale < 2e-4


def test_state_handoff_with_xla_path():
    """zi/final-state are TDF-II vectors interchangeable with iir_block:
    pallas -> xla -> pallas continuation equals single-shot."""
    b, a = FILTERS["biquad_complex_poles"]
    bf, af = b.astype(np.float32), a.astype(np.float32)
    x = RNG.standard_normal(3000).astype(np.float32)
    full = np.asarray(iir_reference(bf, af, x))

    y1, z1 = iir_pallas(b, a, x[:1000], interpret=True)
    y2, z2 = iir_block(bf, af, x[1000:2000], zi=z1, impl="xla")
    y3, z3 = iir_pallas(b, a, x[2000:], zi=z2, interpret=True)
    streamed = np.concatenate([np.asarray(y1), np.asarray(y2),
                               np.asarray(y3)])
    scale = np.max(np.abs(full)) + 1e-9
    assert np.max(np.abs(streamed - full)) / scale < 5e-4


def test_first_order_state_handoff():
    b, a = FILTERS["first_order_deemph"]
    bf, af = b.astype(np.float32), a.astype(np.float32)
    x = RNG.standard_normal(4096).astype(np.float32)
    full, zf_full = iir_block(bf, af, x, impl="xla")
    y1, z1 = iir_pallas(b, a, x[:2048], interpret=True)
    y2, z2 = iir_pallas(b, a, x[2048:], zi=z1, interpret=True)
    streamed = np.concatenate([np.asarray(y1), np.asarray(y2)])
    scale = np.max(np.abs(np.asarray(full))) + 1e-9
    assert np.max(np.abs(streamed - np.asarray(full))) / scale < 2e-4
    np.testing.assert_allclose(np.asarray(z2), np.asarray(zf_full),
                               rtol=2e-3, atol=1e-5)


def test_repeated_poles_fall_back():
    # double real pole at 0.5 -> defective M -> not supported
    a = np.poly([0.5, 0.5])
    b = np.array([1.0, 0.0, 0.0])
    assert not iir_pallas_supported(b, a)
    with pytest.raises(ValueError):
        iir_pallas(b, a, np.zeros(16, np.float32), interpret=True)


def test_high_order_falls_back():
    # order 9 > 8
    a = np.poly(0.9 * np.exp(1j * np.linspace(0.1, 3.0, 9))).real
    b = np.zeros(10)
    b[0] = 1.0
    assert not iir_pallas_supported(b, a)


def test_auto_dispatch_is_xla_on_cpu():
    """On the CPU backend impl='auto' stays on the exact scan (bit-exact
    tests elsewhere rely on it); impl='pallas' forces the kernel."""
    b, a = FILTERS["biquad_complex_poles"]
    bf, af = b.astype(np.float32), a.astype(np.float32)
    x = RNG.standard_normal(1024).astype(np.float32)
    y_auto, _ = iir_block(bf, af, x)
    y_xla, _ = iir_block(bf, af, x, impl="xla")
    np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_xla))
    y_pal, _ = iir_block(bf, af, x, impl="pallas")
    scale = np.max(np.abs(np.asarray(y_xla))) + 1e-9
    assert np.max(np.abs(np.asarray(y_pal) - np.asarray(y_xla))) / scale \
        < 2e-4


def test_planar_complex_input():
    from gsdr_tpu.carray import ComplexArray

    b, a = FILTERS["biquad_complex_poles"]
    bf, af = b.astype(np.float32), a.astype(np.float32)
    z = (RNG.standard_normal(2000) + 1j * RNG.standard_normal(2000))
    x = ComplexArray.from_complex(z.astype(np.complex64))
    want, _ = iir_block(bf, af, x, impl="xla")
    got, _ = iir_block(bf, af, x, impl="pallas")
    err = np.max(np.abs(got.to_numpy() - want.to_numpy()))
    scale = np.max(np.abs(want.to_numpy())) + 1e-9
    assert err / scale < 2e-4
