"""Benchmark suite over the five BASELINE.json configurations.

    python -m benchmarks.run_all [--quick]

Runs on whatever backend jax selects (the attached TPU chip in
deployment; CPU works for smoke runs with --quick). One JSON line per
config; the flagship line matches bench.py's metric. Timing methodology:
gsdr_tpu.utils.timing (scan-in-jit; the tunnel backend has no working
block_until_ready and tens-of-ms dispatch costs).
"""

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.ops.fir import fir
from gsdr_tpu.ops.mixer import freq_shift
from gsdr_tpu.pipelines import AmReceiver, FmChannelizer, QpskModem, \
    Qpsk256Modem
from gsdr_tpu.utils.timing import time_step as _time_step

_STRICT = True


def time_step(step, state, block, iters=20, reps=3):
    # --quick smoke runs accept dispatch-floor numbers (strict=False):
    # tiny workloads cannot clear the noise guard on any backend, and the
    # smoke run checks structure, not throughput
    return _time_step(step, state, block, iters=iters, reps=reps,
                      strict=_STRICT)


def _lowpass(num_taps, cutoff_frac):
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    h = np.sinc(2 * cutoff_frac * n) * np.hamming(num_taps)
    return tuple((h / h.sum()).astype(np.float32).tolist())


def _noise(n, seed=0):
    r = np.random.default_rng(seed)
    return ComplexArray(
        jnp.asarray(r.standard_normal(n), jnp.float32),
        jnp.asarray(r.standard_normal(n), jnp.float32),
    )


def bench_am(n, iters):
    """Config 1: AM demod, 64K+ samples."""
    model = AmReceiver(
        sample_rate=1e6, tuning_frequency=0.0,
        channel_frequencies=(100_000.0,), decimation=4,
        low_pass_taps=_lowpass(64, 0.05))
    rf = _noise(n)
    # the fused AM chain is ~0.1 ms/step: needs many chained iters to
    # rise above the ~35 ms dispatch floor
    sec = time_step(model.step, model.init(), rf, iters=iters * 40)
    return {"metric": "am_demod_1ch_input_msps",
            "value": round(n / sec / 1e6, 2), "unit": "Msamples/s"}


def bench_shift_fir(n, iters):
    """Config 2: freq shift + 64-tap FIR, 4x decimation."""
    taps = jnp.asarray(_lowpass(64, 0.1))

    def step(state, x):
        # loop-carried dependence defeats hoisting (timing.py docstring)
        mixed = freq_shift(x + state, 12_345.0, 1e6)
        y = fir(mixed, taps, 4)
        return (jnp.sum(y.re) + jnp.sum(y.im)) * 1e-30, y

    rf = _noise(n)
    sec = time_step(step, jnp.float32(0.0), rf, iters=iters)
    return {"metric": "shift_fir64_dec4_input_msps",
            "value": round(n / sec / 1e6, 2), "unit": "Msamples/s"}


def bench_shift_fir_fused(n, iters):
    """Config 2, framework-native form: shift+FIR+decimate as ONE complex-
    tap-bank op (the LO folds into the taps; kernels/channelize_pallas)."""
    from gsdr_tpu.ops.channelize import make_complex_tap_bank
    from gsdr_tpu.kernels.channelize_pallas import (
        mix_fir_decimate_bank_pallas,
        pallas_supported,
    )

    kernel = make_complex_tap_bank(_lowpass(64, 0.1), [12_345.0], 1e6)
    rf = _noise(n)
    assert pallas_supported(4, 64)

    def step(state, x):
        from gsdr_tpu.carray import ComplexArray
        y = mix_fir_decimate_bank_pallas(
            ComplexArray(x.re + state, x.im), kernel, 4)
        return (jnp.sum(y.re) + jnp.sum(y.im)) * 1e-30, y

    # the nt-mode kernel is ~40-60 us/step at 2^20: needs ~1000 chained
    # iters to rise above the tunnel's ~35 ms dispatch floor
    sec = time_step(step, jnp.float32(0.0), rf, iters=iters * 100)
    return {"metric": "shift_fir64_dec4_fused_input_msps",
            "value": round(n / sec / 1e6, 2), "unit": "Msamples/s"}


def bench_fm(n, iters, impl="xla", nch=16):
    """Config 3 (flagship): C-channel FM chain incl. de-emphasis.

    nch=64 fills the MXU's 128-wide output dimension (2C = 128); at
    nch=16 the round-2 stacked kernel fills it with R=4 output phases.
    The fused kernel runs ~0.3 ms/step: 20x the base iteration count is
    needed for the K-step scan to rise above dispatch-overhead noise
    (time_step raises otherwise)."""
    model = FmChannelizer(
        sample_rate=1e6, tuning_frequency=0.0,
        channel_frequencies=tuple(-480_000.0 + (960_000.0 / nch) * i
                                  for i in range(nch)),
        frequency_deviation=75_000.0, decimation=4,
        low_pass_taps=_lowpass(64, 0.03), impl=impl)
    rf = _noise(n)
    mult = 20 if impl == "pallas" else 1
    sec = time_step(model.step, model.init(), rf, iters=iters * mult)
    return {"metric": f"fm_channelizer_{nch}ch_{impl}_input_msps",
            "value": round(n / sec / 1e6, 2), "unit": "Msamples/s"}


def bench_pfb(n, iters, k=16, impl="xla"):
    """Uniform-grid PFB channelizer (beyond-parity op): K channels at
    critical decimation."""
    from gsdr_tpu.ops.pfb import pfb_channelize

    taps = _lowpass(k * 8, 0.4 / k)
    rf = _noise(n)

    def step(state, x):
        y = pfb_channelize(
            ComplexArray(x.re + state, x.im), taps, k, impl=impl)
        return (jnp.sum(y.re) + jnp.sum(y.im)) * 1e-30, y

    sec = time_step(step, jnp.float32(0.0), rf, iters=iters * 40)
    return {"metric": f"pfb_{k}ch_{impl}_input_msps",
            "value": round(n / sec / 1e6, 2), "unit": "Msamples/s"}


def bench_fm_wideband(n, iters, impl="pfb", dec=64, k=64):
    """Round-4 wideband uniform-grid FM chain: 64 channels on the Fs/64
    grid, critically decimated (D=64), 512-tap prototype (Q=8) — the
    realistic many-channel receiver shape where the PFB front's fold
    amortizes the filter over the grid. impl='pfb' runs the PFB-fronted
    fused kernel; impl='pallas' the dense Toeplitz fused kernel on the
    SAME config (the A/B partner; benchmarks/pfb_ab.py has the ladder).
    dec=8 is the P=8 oversampled class the round-5 win rule newly
    auto-dispatches (pfb 446-553 vs dense 743-750 us at 2^20); k=128
    (T=1024) is the widest measured grid — the PFB step is nearly
    grid-independent at critical sampling (~65 us at K=64 AND K=128,
    where dense reads 175-181)."""
    model = FmChannelizer(
        sample_rate=1e6, tuning_frequency=0.0,
        channel_frequencies=tuple(-(1e6 / k) * i for i in range(k)),
        frequency_deviation=75_000.0, decimation=dec,
        low_pass_taps=_lowpass(8 * k, 0.4 / k), impl=impl)
    rf = _noise(n)
    # the round-5 ns=2 PFB default runs the critical step at ~65 us:
    # 200 chained iters (13 ms) no longer clear the ~40 ms dispatch
    # floor and time_step refuses — 40x it is
    mult = 40 if dec == k else 5
    sec = time_step(model.step, model.init(), rf, iters=iters * mult)
    name = "crit" if dec == k else f"d{dec}"
    return {"metric": f"fm_wideband_{k}ch_{name}_{impl}_input_msps",
            "value": round(n / sec / 1e6, 2), "unit": "Msamples/s"}


def bench_am_wideband(n, iters, impl="pfb"):
    """Round-4 wideband uniform-grid AM: same grid/filter class as
    bench_fm_wideband; the AM envelope has almost no VPU tail so the PFB
    front's MXU saving shows fully (measured 2.2x vs dense)."""
    k = 64
    model = AmReceiver(
        sample_rate=1e6, tuning_frequency=0.0,
        channel_frequencies=tuple(-(1e6 / k) * i for i in range(k)),
        decimation=k, low_pass_taps=_lowpass(512, 0.4 / k), impl=impl)
    rf = _noise(n)
    sec = time_step(model.step, model.init(), rf, iters=iters * 40)
    return {"metric": f"am_wideband_64ch_crit_{impl}_input_msps",
            "value": round(n / sec / 1e6, 2), "unit": "Msamples/s"}


def bench_qpsk(n, iters):
    """Config 4: QPSK mod/demod loopback."""
    modem = QpskModem()
    data = jnp.asarray(
        np.random.default_rng(0).integers(0, 4, n), jnp.int32)

    def step(state, d):
        from gsdr_tpu.ops.qpsk import qpsk_demodulate_symbols
        # integer data dependence on the carried state defeats CSE/hoisting
        d = (d + state.astype(jnp.int32)) % 4
        # sign arithmetic, not a table gather (TPU tiny-table gathers
        # lower to per-element dynamic slices; see ops/qpsk.py)
        s = ComplexArray(
            1.0 - 2.0 * jnp.bitwise_and(d, 1).astype(jnp.float32),
            1.0 - 2.0 * (jnp.right_shift(d, 1) & 1).astype(jnp.float32))
        out = qpsk_demodulate_symbols(s)
        # full-output dependence: out[0]-only let XLA demodulate ONE symbol
        return (jnp.sum(out) % 1021).astype(jnp.float32), out

    # sign-arithmetic mod/demod is ~5 us/step at 2^20 syms: needs ~10000
    # chained iters to clear the dispatch floor
    sec = time_step(step, jnp.zeros(()), data, iters=iters * 1000)
    return {"metric": "qpsk_loopback_msym_s",
            "value": round(n / sec / 1e6, 2), "unit": "Msymbols/s"}


def bench_qpsk256(n, iters, ctype=None, awgn=False):
    """Config 5 shape (single-chip portion): 256-ary loopback.

    Rectangular uses the O(1) arithmetic fast paths; circular the
    round-3 ring-arithmetic mod + ring-NN demod (exhaustive NN stays
    the ops-level default). ``awgn=True`` adds a precomputed complex
    noise vector between tx and rx (round-3 honesty row: the clean
    composite is constant-folding-prone and unrepresentative of a
    deployed link; the noise is fixed across iterations, which keeps the
    channel add live because tx varies with the carried state)."""
    from gsdr_tpu.ops.qpsk256 import RECTANGULAR

    ctype = RECTANGULAR if ctype is None else ctype
    modem = Qpsk256Modem(constellation_type=ctype)
    syms = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, n), jnp.int32)
    r = np.random.default_rng(1)
    sigma = 0.05 if awgn else 0.0  # ~20 dB SNR at unit-ish symbol power
    nre = jnp.asarray(sigma * r.standard_normal(n), jnp.float32)
    nim = jnp.asarray(sigma * r.standard_normal(n), jnp.float32)

    def step(state, s):
        s = (s + state.astype(jnp.int32)) % 256
        tx = modem.tx(s)
        if awgn:
            tx = ComplexArray(tx.re + nre, tx.im + nim)
        out = modem.rx(tx)
        return (jnp.sum(out) % 1021).astype(jnp.float32), out

    name = "rect" if ctype == RECTANGULAR else "circ"
    if awgn:
        name += "_awgn"
    sec = time_step(step, jnp.zeros(()), syms, iters=iters * 200)
    return {"metric": f"qpsk256_loopback_{name}_msym_s",
            "value": round(n / sec / 1e6, 2), "unit": "Msymbols/s"}


def bench_iir(n, iters, impl="auto"):
    """Standalone IIR biquad (the reference's flagship op,
    /root/reference/src/iir.cu) — impl='auto' is the pole-diagonalized
    Pallas kernel on TPU, the exact blocked scan elsewhere."""
    from gsdr_tpu.ops.iir import iir_block

    b = np.array([0.0675, 0.135, 0.0675], np.float32)
    a = np.array([1.0, -1.143, 0.413], np.float32)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(n).astype(np.float32))

    def step(state, xx):
        y, zf = iir_block(b, a, xx + state * 1e-30, impl=impl)
        return zf[0], y

    # the kernel is ~60 us at 1M samples: many iterations needed to rise
    # above the tunnel's per-dispatch noise (200 iters = 12 ms measured
    # borderline-refused in round 5; 40x clears it)
    sec = time_step(step, jnp.float32(0.0), x, iters=iters * 40)
    return {"metric": f"iir_biquad_{impl}_msps",
            "value": round(n / sec / 1e6, 2), "unit": "Msamples/s"}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="small sizes / few iters (CPU smoke)")
    args = p.parse_args(argv)
    n = 1 << 16 if args.quick else 1 << 20
    iters = 3 if args.quick else 10
    if args.quick:
        global _STRICT
        _STRICT = False

    rows = [
        lambda: bench_am(n, iters),
        lambda: bench_shift_fir(n, iters),
        lambda: bench_shift_fir_fused(n, iters),
        lambda: bench_fm(n, iters, impl="xla"),
        lambda: bench_fm(n, iters, impl="pallas"),
        lambda: bench_fm(n, iters, impl="pallas", nch=64),
        lambda: bench_pfb(n, iters, impl="xla"),
        lambda: bench_pfb(n, iters, impl="pallas"),
        lambda: bench_fm_wideband(n, iters, impl="pfb"),
        lambda: bench_fm_wideband(n, iters, impl="pallas"),
        lambda: bench_fm_wideband(n, iters, impl="pfb", dec=8),
        lambda: bench_fm_wideband(n, iters, impl="pfb", dec=128, k=128),
        lambda: bench_am_wideband(n, iters, impl="pfb"),
        lambda: bench_qpsk(n, iters),
        lambda: bench_qpsk256(min(n, 1 << 19), iters),
        lambda: bench_qpsk256(min(n, 1 << 19), iters, ctype=1),  # CIRC rings
        lambda: bench_qpsk256(min(n, 1 << 19), iters, awgn=True),
        lambda: bench_qpsk256(min(n, 1 << 19), iters, ctype=1, awgn=True),
        lambda: bench_iir(n, iters),
    ]
    # print as each row lands (a late failure must not eat earlier rows)
    for row in rows:
        try:
            r = row()
        except Exception as e:
            r = {"error": str(e)[:160]}
        r["backend"] = jax.default_backend()
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
