"""On-hardware parity checks for the Pallas kernels (small shapes).

Interpret-mode tests have twice passed while the real chip misbehaved
(tiny-tile transpose miscompile; bf16 rounding-mode differences —
CLAUDE.md). bench.py gates the flagship FM chain every run; this script
covers the REST of the kernel surface on the attached chip:

  * stacked channelizer kernel at D in {1, 2, 4} (round-2 D-coverage)
  * fused AM chain incl. the pad_m arbitrary-length path
  * pole-diagonalized IIR kernel (order 2 and 4)
  * QPSK256 Pallas NN demod vs the XLA matmul+argmin path

Run:  python -m benchmarks.hw_parity [--json OUT.json]
(one JSON line per check; --json additionally writes every check + the
verdict to one committed artifact, so per-round kernel-class evidence is
driver-visible — VERDICT round-4 weak #6).
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

RESULTS = []  # every _report row, for the --json artifact


def _planar(n, scale=1.0):
    return ComplexArray(
        jnp.asarray(scale * RNG.standard_normal(n), jnp.float32),
        jnp.asarray(scale * RNG.standard_normal(n), jnp.float32),
    )


def _report(name, err, bound):
    ok = bool(err < bound)
    row = {"check": name, "max_rel_err": round(float(err), 8),
           "bound": bound, "ok": ok}
    RESULTS.append(row)
    print(json.dumps(row), flush=True)
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
        # round-4: T % D != 0 (trailing-zero tap pad)
        (4096, 65, 4, [250_000.0, 44_100.0]),
    ]:
        taps = np.hanning(t).astype(np.float32)
        taps /= taps.sum()
        bank = make_complex_tap_bank(taps, shifts, 1e6)
        x = _planar(n)
        want = mix_fir_decimate_bank(x, bank, d)
        got = mix_fir_decimate_bank_pallas(x, bank, d)
        err = max(_rel(got.re, want.re), _rel(got.im, want.im))
        ok &= _report(f"channelize_pallas_D{d}_T{t}", err, 2e-3)
        got32 = mix_fir_decimate_bank_pallas(x, bank, d, precision="f32")
        err32 = max(_rel(got32.re, want.re), _rel(got32.im, want.im))
        ok &= _report(f"channelize_pallas_D{d}_T{t}_f32", err32, 1e-5)
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

    # 64-channel geometry at the adopted big-block sizing (bn=1024,
    # n_sub=8 via the n_sub-aware VMEM model): guards the large-M
    # footprint + split interplay on real hardware. Shorter buffer than
    # the bench shape, same forced geometry.
    from gsdr_tpu.kernels import fm_chain_pallas as fcp
    from gsdr_tpu.ops.channelize import make_complex_tap_bank
    from gsdr_tpu.ops.fm import fm_demod_gain
    from gsdr_tpu.pipelines.fm_radio import fm_deemphasis_coeffs
    from gsdr_tpu.utils.phase import phase_digit_table
    fs = 1e6
    taps64 = np.asarray(lowpass(64, 0.03), np.float64)
    shifts = [3000.0 * (k + 1) for k in range(64)]
    bank = make_complex_tap_bank(taps64, shifts, fs)
    gain = fm_demod_gain(fs, 75_000.0)
    b_, a_ = fm_deemphasis_coeffs(75e-6, fs / 4)
    # N = 2^20: the exact adopted production geometry (bn=1024 from the
    # chooser at this length). A SHORT buffer with _force_bn=1024 OOMs
    # scoped VMEM by ~2.1M — Mosaic VMEM-promotes the then-small xq
    # operands (4 x 545KB at n_coarse=2176) on top of the block working
    # set; the chooser never produces that combination.
    n64 = 1 << 20
    t3 = np.arange(n64 + 63) / fs
    sig3 = np.zeros(n64 + 63, np.complex128)
    for k in range(0, 64, 7):
        msg = np.sin(2 * np.pi * (700.0 + 37.0 * k) * t3)
        sig3 += 0.05 * np.exp(
            1j * (2 * np.pi * shifts[k] * t3 + 0.3 * msg))
    buf = ComplexArray(jnp.asarray(sig3.real, jnp.float32),
                       jnp.asarray(sig3.imag, jnp.float32))
    plan = fcp.fm_chain_plan(bank, 4, gain, b_, a_, n64 + 63, shifts, fs,
                             _force_bn=1024)
    lo = phase_digit_table(shifts, fs)
    cf = ComplexArray(jnp.zeros((64, 1), jnp.float32),
                      jnp.zeros((64, 1), jnp.float32))
    au, _, _ = fcp.fm_chain_apply(plan, buf, lo, jnp.asarray(0, jnp.int32),
                                  cf, jnp.zeros((64, 1), jnp.float32))
    # Reference: the UNSPLIT kernel at bn=256 (the proven pre-round-3
    # geometry — unsplit cannot run bn>=512 at 64ch, its full-bn VPU
    # temporaries exceed scoped VMEM; that is what the n_sub-aware model
    # encodes). Different bn only re-associates the de-emphasis lane
    # scan (ulp-level); real outputs are the same math.
    plan1 = fcp.fm_chain_plan(bank, 4, gain, b_, a_, n64 + 63, shifts, fs,
                              _force_bn=256, n_sub=1)
    au1, _, _ = fcp.fm_chain_apply(plan1, buf, lo,
                                   jnp.asarray(0, jnp.int32), cf,
                                   jnp.zeros((64, 1), jnp.float32))
    au, au1 = np.asarray(au), np.asarray(au1)
    err = float(np.max(np.abs(au[:, 256:] - au1[:, 256:]))
                / max(np.max(np.abs(au1)), 1e-9))
    ok &= _report("fm64_bn1024_split_vs_bn256_unsplit", err, 1e-5)
    return ok


def check_pfb_fm():
    """Round-4 PFB-fronted fused chain vs the XLA chain on HW: the fold's
    pltpu.roll/select windows and the DFT-bank dot have no interpret-mode
    guarantee (lane-offset concats PASSED interpret and crashed the HW
    compiler this round)."""
    import dataclasses as dc

    from gsdr_tpu.pipelines import FmChannelizer

    def lowpass(nt, cf):
        n = np.arange(nt) - (nt - 1) / 2.0
        h = np.sinc(2 * cf * n) * np.hamming(nt)
        return tuple((h / h.sum()).astype(np.float32).tolist())

    fs = 1_024_000.0
    k = 16
    m = FmChannelizer(
        sample_rate=fs, tuning_frequency=0.0,
        channel_frequencies=tuple(-fs / 2 + (fs / k) * i for i in range(k)),
        frequency_deviation=75_000.0, decimation=4,
        low_pass_taps=lowpass(128, 0.4 / k), impl="xla")
    mp = dc.replace(m, impl="pfb")
    n = 16384
    tt = np.arange(n) / fs
    sig = np.zeros(n, np.complex128)
    for c, f in enumerate(m.channel_frequencies):
        msg = np.sin(2 * np.pi * (500.0 + 37.0 * c) * tt)
        sig += 0.03 * np.exp(1j * (2 * np.pi * f * tt + 0.3 * msg))
    rf = ComplexArray(jnp.asarray(sig.real, jnp.float32),
                      jnp.asarray(sig.imag, jnp.float32))
    _, y1 = m.step(m.init(), rf)
    _, y2 = mp.step(mp.init(), rf)
    y1, y2 = np.asarray(y1), np.asarray(y2)
    err = float(np.max(np.abs(y1[:, 256:] - y2[:, 256:]))
                / np.max(np.abs(y1)))
    ok = _report("pfb_fm_fused_16ch_d4_t128", err, 2e-3)

    # ODD fold tap count (advisor round 4): Q = ceil(85/16) = 6 with a
    # ragged last fold row — the (bs + Q)-row roll span is not 8-sublane
    # aligned; only the CPU interpret test covered this class before, and
    # this kernel family has passed interpret while crashing Mosaic on HW.
    modd = dc.replace(m, low_pass_taps=lowpass(85, 0.4 / k))
    mpodd = dc.replace(modd, impl="pfb")
    _, yo1 = modd.step(modd.init(), rf)
    _, yo2 = mpodd.step(mpodd.init(), rf)
    yo1, yo2 = np.asarray(yo1), np.asarray(yo2)
    err = float(np.max(np.abs(yo1[:, 256:] - yo2[:, 256:]))
                / np.max(np.abs(yo1)))
    ok &= _report("pfb_fm_fused_16ch_d4_t85_oddq", err, 2e-3)

    # K=64 wide-grid geometry (advisor round 4): the wideband 64-channel
    # class from the round-4 perf tables, never HW-compiled in this suite
    # (2K = 128-lane DFT bank, Q=8). D=8 makes it P=8 — the phase count
    # the round-5 win rule newly admits to auto-dispatch.
    k64 = 64
    m64 = FmChannelizer(
        sample_rate=fs, tuning_frequency=0.0,
        channel_frequencies=tuple(
            -fs / 2 + (fs / k64) * i for i in range(k64)),
        frequency_deviation=75_000.0, decimation=8,
        low_pass_taps=lowpass(512, 0.4 / k64), impl="xla")
    mp64 = dc.replace(m64, impl="pfb")
    n64 = 32768
    tt64 = np.arange(n64) / fs
    sig64 = np.zeros(n64, np.complex128)
    # every channel carries a real FM signal: a SILENT channel's
    # discriminator input is noise-level leakage and atan2 comparisons
    # there are ill-posed between implementations (CLAUDE.md testing
    # note — a sparse 1-in-5 excitation made this row read 0.44 on both
    # backends from the silent channels alone)
    for c in range(k64):
        f = m64.channel_frequencies[c]
        msg = np.sin(2 * np.pi * (500.0 + 23.0 * c) * tt64)
        sig64 += 0.02 * np.exp(1j * (2 * np.pi * f * tt64 + 0.3 * msg))
    rf64 = ComplexArray(jnp.asarray(sig64.real, jnp.float32),
                        jnp.asarray(sig64.imag, jnp.float32))
    _, w1 = m64.step(m64.init(), rf64)
    _, w2 = mp64.step(mp64.init(), rf64)
    w1, w2 = np.asarray(w1), np.asarray(w2)
    err = float(np.max(np.abs(w1[:, 256:] - w2[:, 256:]))
                / np.max(np.abs(w1)))
    ok &= _report("pfb_fm_fused_64ch_d8_t512_p8", err, 2e-3)

    # AM PFB front (wideband shape class: critical decimation, Q=8)
    from gsdr_tpu.pipelines import AmReceiver

    ma = AmReceiver(
        sample_rate=fs, tuning_frequency=0.0,
        channel_frequencies=tuple(-fs / 2 + (fs / k) * i for i in range(k)),
        decimation=16, low_pass_taps=lowpass(128, 0.4 / k), impl="xla")
    map_ = dc.replace(ma, impl="pfb")
    _, a1 = ma.step(ma.init(), rf)
    _, a2 = map_.step(map_.init(), rf)
    err = float(np.max(np.abs(np.asarray(a1) - np.asarray(a2))))
    ok &= _report("pfb_am_fused_16ch_d16_t128", err, 2e-3)

    # AM at the P=8 phase count the round-5 rule newly auto-dispatches
    ma8 = dc.replace(ma, decimation=2)  # K=16, D=2 -> P=8
    map8 = dc.replace(ma8, impl="pfb")
    _, b1 = ma8.step(ma8.init(), rf)
    _, b2 = map8.step(map8.init(), rf)
    err = float(np.max(np.abs(np.asarray(b1) - np.asarray(b2))))
    ok &= _report("pfb_am_fused_16ch_d2_t128_p8", err, 2e-3)

    # K=128 critical (2K = 256-lane DFT bank): the widest measured grid,
    # 2.7x faster than dense in round 5 — every channel excited
    k128 = 128
    m128 = FmChannelizer(
        sample_rate=fs, tuning_frequency=0.0,
        channel_frequencies=tuple(
            -fs / 2 + (fs / k128) * i for i in range(k128)),
        frequency_deviation=75_000.0, decimation=128,
        low_pass_taps=lowpass(1024, 0.4 / k128), impl="xla")
    mp128 = dc.replace(m128, impl="pfb")
    n128 = 65536
    tt1 = np.arange(n128) / fs
    sig1 = np.zeros(n128, np.complex128)
    for c in range(k128):
        f = m128.channel_frequencies[c]
        msg = np.sin(2 * np.pi * (300.0 + 11.0 * c) * tt1)
        sig1 += 0.008 * np.exp(1j * (2 * np.pi * f * tt1 + 0.3 * msg))
    rf1 = ComplexArray(jnp.asarray(sig1.real, jnp.float32),
                       jnp.asarray(sig1.imag, jnp.float32))
    _, v1 = m128.step(m128.init(), rf1)
    _, v2 = mp128.step(mp128.init(), rf1)
    v1, v2 = np.asarray(v1), np.asarray(v2)
    err = float(np.max(np.abs(v1[:, 128:] - v2[:, 128:]))
                / np.max(np.abs(v1)))
    ok &= _report("pfb_fm_fused_128ch_d128_t1024", err, 2e-3)
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


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--json", metavar="PATH", default=None,
                    help="also write all checks + verdict to one JSON file")
    args = ap.parse_args(argv)

    ok = True
    ok &= check_channelizer()
    ok &= check_am()
    ok &= check_fm()
    ok &= check_pfb_fm()
    ok &= check_iir()
    ok &= check_qpsk256()
    print(json.dumps({"all_ok": bool(ok)}), flush=True)
    if args.json:
        import datetime
        import jax

        with open(args.json, "w") as f:
            json.dump({
                "date": datetime.date.today().isoformat(),
                "backend": jax.devices()[0].platform,
                "num_checks": len(RESULTS),
                "all_ok": bool(ok),
                "checks": RESULTS,
            }, f, indent=1)
            f.write("\n")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
