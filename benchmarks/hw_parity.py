"""On-hardware parity checks for the Pallas kernels (small shapes).

Interpret-mode tests have twice passed while the real chip misbehaved
(tiny-tile transpose miscompile; bf16 rounding-mode differences —
CLAUDE.md). bench.py gates the flagship FM chain every run; this script
covers the REST of the kernel surface on the attached chip:

  * stacked channelizer kernel at D in {1, 2, 4} (round-2 D-coverage)
  * fused AM chain incl. the pad_m arbitrary-length path
  * pole-diagonalized IIR kernel (order 2 and 4)
  * QPSK256 Pallas NN demod vs the XLA matmul+argmin path

Run:  python -m benchmarks.hw_parity     (one JSON line per check)
Keep shapes small — remote compiles cost 10s-100s of seconds each.
"""

import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

import jax.numpy as jnp

from gsdr_tpu.carray import ComplexArray

RNG = np.random.default_rng(42)


def _planar(n, scale=1.0):
    return ComplexArray(
        jnp.asarray(scale * RNG.standard_normal(n), jnp.float32),
        jnp.asarray(scale * RNG.standard_normal(n), jnp.float32),
    )


def _report(name, err, bound):
    ok = bool(err < bound)
    print(json.dumps({"check": name, "max_rel_err": round(float(err), 8),
                      "bound": bound, "ok": ok}), flush=True)
    return ok


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))


def check_channelizer():
    from gsdr_tpu.ops.channelize import (make_complex_tap_bank,
                                         mix_fir_decimate_bank)
    from gsdr_tpu.kernels.channelize_pallas import mix_fir_decimate_bank_pallas

    ok = True
    for n, t, d, shifts in [
        (3000, 64, 1, [10_000.0, -7_000.0]),
        (3000, 32, 2, [50_000.0]),
        (4096, 64, 4, [250_000.0, 0.0, 44_100.0]),
    ]:
        taps = np.hanning(t).astype(np.float32)
        taps /= taps.sum()
        bank = make_complex_tap_bank(taps, shifts, 1e6)
        x = _planar(n)
        want = mix_fir_decimate_bank(x, bank, d)
        got = mix_fir_decimate_bank_pallas(x, bank, d)
        err = max(_rel(got.re, want.re), _rel(got.im, want.im))
        ok &= _report(f"channelize_pallas_D{d}", err, 2e-3)
        got32 = mix_fir_decimate_bank_pallas(x, bank, d, precision="f32")
        err32 = max(_rel(got32.re, want.re), _rel(got32.im, want.im))
        ok &= _report(f"channelize_pallas_D{d}_f32", err32, 1e-5)
    return ok


def check_am():
    import dataclasses as dc

    from gsdr_tpu.pipelines import AmReceiver

    def lowpass(nt, cf):
        n = np.arange(nt) - (nt - 1) / 2.0
        h = np.sinc(2 * cf * n) * np.hamming(nt)
        return tuple((h / h.sum()).astype(np.float32).tolist())

    ok = True
    # 4100 exercises the pad_m path (M=1025 not a multiple of R*128)
    for n in (4100, 8192):
        m = AmReceiver(sample_rate=1e6, tuning_frequency=0.0,
                       channel_frequencies=(120_000.0, -80_000.0),
                       decimation=4, low_pass_taps=lowpass(64, 0.04),
                       impl="xla")
        mp = dc.replace(m, impl="pallas")
        rf = _planar(n, scale=0.3)
        _, y1 = m.step(m.init(), rf)
        _, y2 = mp.step(mp.init(), rf)
        ok &= _report(f"am_fused_n{n}", _rel(y2, y1), 2e-3)
    return ok


def check_fm():
    """Fused FM chain at a NON-flagship shape (D=2, 4 ch, block 8192 ->
    r downgrades for M divisibility) — bench.py gates only the flagship
    geometry; this catches stacking/padding regressions elsewhere."""
    import dataclasses as dc

    from gsdr_tpu.pipelines import FmChannelizer

    def lowpass(nt, cf):
        n = np.arange(nt) - (nt - 1) / 2.0
        h = np.sinc(2 * cf * n) * np.hamming(nt)
        return tuple((h / h.sum()).astype(np.float32).tolist())

    m = FmChannelizer(
        sample_rate=1e6, tuning_frequency=0.0,
        channel_frequencies=(100_000.0, 161_000.0, 222_000.0, 283_000.0),
        frequency_deviation=75_000.0, decimation=2,
        low_pass_taps=lowpass(64, 0.04), impl="xla")
    mp = dc.replace(m, impl="pallas")
    n = 8192
    t = np.arange(n) / m.sample_rate
    sig = np.zeros(n, np.complex128)
    for k, f in enumerate(m.channel_frequencies):
        msg = np.sin(2 * np.pi * (700.0 + 400.0 * k) * t)
        sig += 0.1 * np.exp(1j * (2 * np.pi * f * t + 0.3 * msg))
    rf = ComplexArray(jnp.asarray(sig.real, jnp.float32),
                      jnp.asarray(sig.imag, jnp.float32))
    _, y1 = m.step(m.init(), rf)
    _, y2 = mp.step(mp.init(), rf)
    y1, y2 = np.asarray(y1), np.asarray(y2)
    # skip the zero-primed warmup region (atan2 branch-cut ambiguity)
    err = float(np.max(np.abs(y1[:, 256:] - y2[:, 256:]))
                / np.max(np.abs(y1)))
    ok = _report("fm_fused_d2_4ch", err, 2e-3)

    # round-3 pad-and-mask: a NON-multiple M must run fused with correct
    # carried state (two steps; M = 2050 per step is off the R*128 grid)
    n2 = 8200
    t2 = np.arange(2 * n2) / m.sample_rate
    sig2 = np.zeros(2 * n2, np.complex128)
    for k, f in enumerate(m.channel_frequencies):
        msg = np.sin(2 * np.pi * (700.0 + 400.0 * k) * t2)
        sig2 += 0.1 * np.exp(1j * (2 * np.pi * f * t2 + 0.3 * msg))
    blocks = [
        ComplexArray(jnp.asarray(sig2[i * n2:(i + 1) * n2].real, jnp.float32),
                     jnp.asarray(sig2[i * n2:(i + 1) * n2].imag, jnp.float32))
        for i in range(2)
    ]
    st1, st2 = m.init(), mp.init()
    for blk in blocks:
        st1, y1 = m.step(st1, blk)
        st2, y2 = mp.step(st2, blk)
    y1, y2 = np.asarray(y1), np.asarray(y2)
    err = float(np.max(np.abs(y1 - y2)) / np.max(np.abs(y1)))
    ok &= _report("fm_fused_pad_and_mask_m2050", err, 2e-3)
    ok &= _report("fm_fused_pad_carry_f",
                  _rel(st2[2].to_numpy(), st1[2].to_numpy()), 2e-3)
    ok &= _report("fm_fused_pad_carry_z",
                  _rel(np.asarray(st2[3]), np.asarray(st1[3])), 2e-3)
    return ok


def check_iir():
    from gsdr_tpu.ops.iir import iir_block

    ok = True
    for name, b, a in [
        ("biquad", (0.2, 0.3, 0.1), (1.0, -0.6, 0.2)),
        ("order4", (0.05, 0.1, 0.12, 0.1, 0.05),
         (1.0, -1.2, 0.9, -0.33, 0.06)),
    ]:
        x = jnp.asarray(RNG.standard_normal(1 << 16), jnp.float32)
        bj = jnp.asarray(b, jnp.float32)
        aj = jnp.asarray(a, jnp.float32)
        y_k, zf_k = iir_block(bj, aj, x, impl="pallas")
        y_x, zf_x = iir_block(bj, aj, x, impl="xla")
        err = max(_rel(y_k, y_x), _rel(zf_k, zf_x))
        ok &= _report(f"iir_pallas_{name}", err, 1e-5)
    return ok


def check_qpsk256():
    from gsdr_tpu.ops.qpsk256 import (CIRCULAR, qpsk256_constellation,
                                      qpsk256_demodulate, qpsk256_modulate)

    table = qpsk256_constellation(CIRCULAR, planar=True)
    syms = jnp.asarray(RNG.integers(0, 256, 4096), jnp.int32)
    tx = qpsk256_modulate(syms, table)
    rx_x = qpsk256_demodulate(tx, table, out_dtype=jnp.int32, impl="xla")
    rx_p = qpsk256_demodulate(tx, table, out_dtype=jnp.int32, impl="pallas")
    mismatch = float(np.mean(np.asarray(rx_x) != np.asarray(rx_p)))
    return _report("qpsk256_pallas_vs_xla", mismatch, 1e-9)


def main():
    ok = True
    ok &= check_channelizer()
    ok &= check_am()
    ok &= check_fm()
    ok &= check_iir()
    ok &= check_qpsk256()
    print(json.dumps({"all_ok": bool(ok)}), flush=True)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
