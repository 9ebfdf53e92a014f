"""NumPy float64 golden models of the reference semantics.

These capture the *intended* math of /root/reference (with its verified bugs
fixed — SURVEY.md section 2.2) and are the correctness bar for every op.
"""

import numpy as np

# Edge sizes the reference sweeps everywhere (e.g. tests/test_iir.cpp:464-486).
EDGE_SIZES = [1, 2, 3, 4, 15, 16, 17, 31, 32, 33, 1023, 1024, 1025]


def fir_golden(x, taps, decimation=1):
    """out[i] = sum_t x[i*D + t] * taps[t] (src/fir.cu:57-70)."""
    x = np.asarray(x)
    taps = np.asarray(taps)
    t = len(taps)
    n_out = (len(x) - t) // decimation + 1
    out = np.zeros(n_out, dtype=np.result_type(x.dtype, taps.dtype, np.float64))
    for i in range(n_out):
        out[i] = np.dot(x[i * decimation : i * decimation + t], taps)
    return out


def iir_golden(b, a, x, zi_unused=None):
    """Exact sequential Direct-Form recurrence (src/iir.cu:158-178),
    float64, state never reset."""
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = b / a[0]
    a = a / a[0]
    x = np.asarray(x, dtype=np.result_type(x.dtype, np.float64))
    y = np.zeros_like(x)
    for n in range(len(x)):
        acc = 0.0
        for i in range(len(b)):
            if n - i >= 0:
                acc += b[i] * x[n - i]
        for i in range(1, len(a)):
            if n - i >= 0:
                acc -= a[i] * y[n - i]
        y[n] = acc
    return y


def lo_golden(n, freq, fs, first_sample_index=0):
    """e^{j*2*pi*f*(n0+i)/fs} in float64."""
    i = np.arange(n, dtype=np.float64) + float(first_sample_index)
    return np.exp(2j * np.pi * float(freq) * i / float(fs))


def am_golden(x, taps, fs, tuning, channel, decimation=1, first_sample_index=0):
    shift = tuning - channel
    mixed = np.asarray(x) * lo_golden(len(x), shift, fs, first_sample_index)
    filtered = fir_golden(mixed, taps, decimation)
    return 2.0 * np.clip(np.abs(filtered), 0.0, 1.0) - 1.0


def fm_golden(x, taps, fs, tuning, channel, deviation, decimation=1,
              first_sample_index=0):
    shift = tuning - channel
    gain = fs / (2.0 * np.pi * deviation)
    mixed = np.asarray(x) * lo_golden(len(x), shift, fs, first_sample_index)
    filtered = fir_golden(mixed, taps, decimation)
    m = filtered[1:] * np.conj(filtered[:-1])
    return gain * np.arctan2(m.imag, m.real)


def lowpass_taps(num_taps, cutoff_norm):
    """Hamming-windowed sinc low-pass (unit DC gain), for chain tests."""
    n = np.arange(num_taps, dtype=np.float64) - (num_taps - 1) / 2.0
    h = np.sinc(2.0 * cutoff_norm * n) * 2.0 * cutoff_norm
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(num_taps) / (num_taps - 1)) \
        if num_taps > 1 else np.ones(1)
    h = h * w
    return (h / h.sum()).astype(np.float32)


def awgn(rng, signal, snr_db):
    """Add complex AWGN at the given SNR (tests/test_qpsk.cpp:172-210 style)."""
    signal = np.asarray(signal)
    p_sig = np.mean(np.abs(signal) ** 2)
    p_noise = p_sig / (10.0 ** (snr_db / 10.0))
    noise = rng.normal(size=signal.shape) + 1j * rng.normal(size=signal.shape)
    noise *= np.sqrt(p_noise / 2.0)
    return signal + noise.astype(signal.dtype)
