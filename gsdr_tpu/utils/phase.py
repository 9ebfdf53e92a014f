"""Exact long-stream oscillator phase in float32.

The reference carries oscillator phase across calls via an absolute sample
index taken mod sampleRate (src/adjustFrequency.cuh:25, src/am.cu:67), but
its device-side phase math is dimensionally wrong (`fmod(timeSeconds, period)`
mixes seconds with period fractions, src/adjustFrequency.cu:40 — SURVEY.md
section 2.2 bug list). The *intended* semantics — local oscillator
e^{j*2*pi*f*n/Fs} with phase continuity from the global sample index — are
implemented here correctly, and with bounded float32 error over arbitrarily
long streams.

Method: we need frac(f * n / Fs) in [0, 1) for large integer n. Split the
sample index into base-256 digits: n = sum_d digit_d * 256^d. Then

    frac(f*n/Fs) = frac( sum_d digit_d * frac(f * 256^d / Fs) )

The per-digit fractions frac(f * 256^d / Fs) are computed host-side in exact
arbitrary-precision rational arithmetic on the exact binary values of f and
Fs (every float IS a rational), for integral and non-integral rates alike. On device each term is digit (< 256) times a
fraction (< 1), so every intermediate stays < 256 and float32 rounding error
is bounded by ~#digits * 256 * 2^-24 ~ 6e-5 cycles (~4e-4 rad) regardless of
stream length. The reference's own float32 phase path is far looser.
"""

import jax.numpy as jnp

_NUM_DIGITS = 4  # covers sample indices < 2^32 within a block
_BASE_BITS = 8
_BASE = 1 << _BASE_BITS


def digit_fractions(freq_hz, sample_rate):
    """Host-side per-digit phase fractions frac(freq * 256^d / Fs), d=0..3.

    Exact (arbitrary-precision rational arithmetic on the exact binary
    values of the float inputs) for ANY freq/Fs; negative frequencies
    reduce into [0, 1). Returns a list of Python floats in [0, 1).
    """
    # Every float is an exact binary rational, so frac(f * 256^d / Fs) is
    # computable exactly for ANY float inputs via Fraction arithmetic (the
    # former float64-fmod fallback for non-integral rates accumulated
    # rounding in the high digits). The only remaining error is the final
    # rounding of each fraction to float, same as the integral case.
    from fractions import Fraction

    ratio = Fraction(float(freq_hz)) / Fraction(float(sample_rate))
    fr = []
    for d in range(_NUM_DIGITS):
        x = ratio * (_BASE ** d)
        x -= x.numerator // x.denominator  # frac(), exact
        fr.append(x.numerator / x.denominator)
    return fr


def phase_fraction(n, freq_hz, sample_rate):
    """frac(freq * n / Fs) in [0, 1) for an int32 array of sample indices.

    ``n`` must be non-negative and < 2^31. ``freq_hz`` / ``sample_rate`` are
    static Python scalars (they select the host-computed digit fractions).
    Negative frequencies are handled by conjugating: frac(-x) = 1 - frac(x).
    """
    neg = float(freq_hz) < 0
    fr = digit_fractions(abs(float(freq_hz)), sample_rate)
    n = jnp.asarray(n, dtype=jnp.int32)
    acc = jnp.zeros(n.shape, dtype=jnp.float32)
    for d in range(_NUM_DIGITS):
        digit = jnp.bitwise_and(
            jnp.right_shift(n, _BASE_BITS * d), _BASE - 1
        ).astype(jnp.float32)
        acc = acc + digit * jnp.float32(fr[d])
    frac = acc - jnp.floor(acc)
    if neg:
        frac = jnp.where(frac > 0, 1.0 - frac, 0.0)
    return frac


def phase_digit_table(freqs_hz, sample_rate):
    """Host-side digit-fraction table for a bank of oscillators.

    Returns a float32 numpy array of shape (len(freqs), _NUM_DIGITS) with
    row c = [frac(f_c * 256^d / Fs) for d in 0..3]. Negative frequencies are
    normalized via f mod Fs (an integer multiple of n/Fs never changes the
    fraction), so the table is always non-negative. Feed to
    ``phase_fraction_from_table`` with *traced* sample indices — this is how
    jitted streaming code (whose global offset is carried state, not a static
    Python int) and multi-channel channelizers compute exact LO phase.
    """
    import numpy as np

    rows = [digit_fractions(f, sample_rate) for f in freqs_hz]
    return np.asarray(rows, dtype=np.float32)


def phase_fraction_from_table(n, table):
    """frac(f * n / Fs) for traced int32 indices ``n`` and a digit table.

    ``n``: int32 array, any shape, values in [0, 2^31). ``table``: (..., 4)
    digit fractions from ``phase_digit_table`` — leading axes broadcast
    against ``n`` (e.g. table (C, 1, 4) against n (1, N) gives (C, N)).
    Every intermediate stays < 256 so float32 error is bounded at ~6e-5
    cycles regardless of stream length (module docstring).
    """
    n = jnp.asarray(n, dtype=jnp.int32)
    table = jnp.asarray(table, dtype=jnp.float32)
    acc = jnp.zeros(jnp.broadcast_shapes(n.shape, table.shape[:-1]), jnp.float32)
    for d in range(_NUM_DIGITS):
        digit = jnp.bitwise_and(
            jnp.right_shift(n, _BASE_BITS * d), _BASE - 1
        ).astype(jnp.float32)
        acc = acc + digit * table[..., d]
    return acc - jnp.floor(acc)


def phase_fraction_offset(first_sample_index, freq_hz, sample_rate):
    """Exact host-side frac(freq * n0 / Fs) for a static integer offset n0.

    Used to fold an arbitrarily large global stream offset into a single
    float32 starting fraction, so devices only ever see block-local indices:
    frac(f*(n0+i)/Fs) = frac(frac(f*n0/Fs) + frac(f*i/Fs)).
    """
    from fractions import Fraction

    x = (Fraction(float(freq_hz)) / Fraction(float(sample_rate))
         * int(first_sample_index))
    x -= x.numerator // x.denominator  # frac(), exact for any float f/Fs
    return x.numerator / x.denominator
