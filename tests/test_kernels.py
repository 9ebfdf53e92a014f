"""Pallas kernels, validated in interpreter mode on CPU.

Correctness bar: bit-level agreement structure with the XLA tap-bank conv
(the bf16x3 contraction carries ~1e-4 relative error by design — inside
the reference CUDA library's f32 test tolerances, SURVEY.md section 4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.kernels.channelize_pallas import (
    mix_fir_decimate_bank_pallas,
    pallas_supported,
)
from gsdr_tpu.ops.channelize import make_complex_tap_bank, \
    mix_fir_decimate_bank

RNG = np.random.default_rng(17)
FS = 1_000_000.0


def _planar(n):
    z = RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
    return ComplexArray.from_complex(z.astype(np.complex64))


class TestChannelizePallas:
    @pytest.mark.parametrize("n,t,d,shifts", [
        (5000, 64, 4, [12_345.0, -5_000.0, 0.0, 99_000.0]),
        (4096, 32, 4, [250_000.0]),
        (9000, 128, 8, [1_000.0, -1_000.0]),
        (700, 16, 4, [44_100.0, 0.0, 3.0]),
    ])
    def test_matches_xla_conv(self, n, t, d, shifts):
        assert pallas_supported(d, t)
        x = _planar(n)
        taps = RNG.standard_normal(t).astype(np.float32) * 0.2
        kernel = make_complex_tap_bank(taps, shifts, FS)
        want = mix_fir_decimate_bank(x, kernel, d)
        got = mix_fir_decimate_bank_pallas(x, kernel, d, interpret=True)
        assert got.shape == want.shape
        scale = np.max(np.abs(want.to_numpy())) + 1e-9
        err = np.max(np.abs(got.to_numpy() - want.to_numpy())) / scale
        assert err < 3e-4, err

    def test_unsupported_configs_rejected(self):
        assert not pallas_supported(3, 64)   # T % D != 0
        assert not pallas_supported(2, 64)   # 2D not sublane-aligned
        assert not pallas_supported(1, 64)
        x = _planar(1000)
        kernel = make_complex_tap_bank(np.ones(8, np.float32), [0.0], FS)
        with pytest.raises(ValueError):
            mix_fir_decimate_bank_pallas(x, kernel, 2, interpret=True)

    def test_impl_pallas_dispatch(self):
        """ops.channelize impl='pallas' routes through the kernel."""
        x = _planar(2048)
        taps = RNG.standard_normal(64).astype(np.float32)
        kernel = make_complex_tap_bank(taps, [10_000.0], FS)
        a = mix_fir_decimate_bank(x, kernel, 4, impl="xla")
        # interpret path not reachable through impl; compare pallas
        # interpret directly for CPU-hermetic testing
        b = mix_fir_decimate_bank_pallas(x, kernel, 4, interpret=True)
        scale = np.max(np.abs(a.to_numpy())) + 1e-9
        assert np.max(np.abs(a.to_numpy() - b.to_numpy())) / scale < 3e-4
