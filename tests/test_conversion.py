"""int8 -> normalized float conversion tests (intent of tests/test_conversion.cpp)."""

import numpy as np
import pytest

from gsdr_tpu import int8_to_norm_float
from golden import EDGE_SIZES


def test_edge_values():
    # include/gsdr/conversion.h:24-29: -128/-127 -> -1.0, 127 -> 1.0, 0 -> 0.0.
    x = np.array([-128, -127, -1, 0, 1, 127], dtype=np.int8)
    out = np.asarray(int8_to_norm_float(x))
    np.testing.assert_allclose(
        out, [-1.0, -1.0, -1 / 127, 0.0, 1 / 127, 1.0], rtol=1e-6
    )
    assert out.dtype == np.float32


@pytest.mark.parametrize("n", EDGE_SIZES)
def test_matches_golden(n):
    rng = np.random.default_rng(n)
    x = rng.integers(-128, 128, size=n, dtype=np.int8)
    expected = np.maximum(-1.0, x.astype(np.float64) / 127.0)
    np.testing.assert_allclose(int8_to_norm_float(x), expected, rtol=1e-6)


def test_statistics_uniform():
    # tests/test_conversion.cpp:126-159: mean/std of uniform int8.
    rng = np.random.default_rng(7)
    x = rng.integers(-128, 128, size=1 << 16, dtype=np.int8)
    out = np.asarray(int8_to_norm_float(x))
    assert abs(out.mean()) < 0.02
    assert abs(out.std() - np.std(np.maximum(-1, x / 127.0))) < 1e-6


def test_determinism():
    rng = np.random.default_rng(3)
    x = rng.integers(-128, 128, size=4096, dtype=np.int8)
    np.testing.assert_array_equal(
        np.asarray(int8_to_norm_float(x)), np.asarray(int8_to_norm_float(x))
    )
