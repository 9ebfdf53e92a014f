"""Direct grid-overhead + per-stage probes for the fused chains (round 5).

VERDICT round-4 asks:
  #3  put a MEASURED number on the flagship's overhead residue — the
      ~40 us between the ~133-us step and the ~90-us SoL was attributed to
      "intrinsic kernel/grid overhead" purely by elimination. The new
      ablate='grid' kernel cut (kernels/fm_chain_pallas._fm_chain_kernel)
      runs the IDENTICAL grid / BlockSpecs / scratch with no compute: its
      time IS the per-step grid machinery + input/output block DMA.
  #1  the PFB front (the perf frontier: wideband FM 88 us, AM 48 us) had
      no stage accounting at all. ablate='dot' now works for front='pfb'
      (per-phase fold+DFT pieces), so the same ladder applies.

Rows per config (consecutive differences = stage costs):
  apply@grid   — grid + DMA only (the direct overhead measurement)
  apply@dot    — + window build/fold + MXU contraction
  apply@rotor  — + LO rotor (pfb/dense both)
  apply@disc   — + discriminator atan2
  apply@full   — + de-emphasis scan + carry exports (the whole kernel)
(end-to-end model.step numbers live in bench.py / benchmarks.run_all —
this harness is kernel-stage attribution only)

Usage:  python -m benchmarks.overhead_probe [--configs flagship,wb64c_t512]
                                            [--rounds 2] [--iters 200]
"""

import argparse
import json

import numpy as np

import jax.numpy as jnp

from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.kernels import fm_chain_pallas as fcp
from gsdr_tpu.ops.channelize import make_complex_tap_bank
from gsdr_tpu.ops.fm import fm_demod_gain
from gsdr_tpu.pipelines.fm_radio import fm_deemphasis_coeffs
from gsdr_tpu.utils.phase import phase_digit_table
from gsdr_tpu.utils.timing import time_step

N_SAMPLES = 1 << 20

# name -> (C, grid K or None for dense/off-grid, D, T, Fs)
CONFIGS = {
    # the bench.py flagship: 16 ch on an OFF-grid 60-kHz spacing (dense
    # Toeplitz kernel, R=16, bn=1024 -> 16 grid steps at 2^20)
    "flagship": (16, None, 4, 64, 1_000_000.0),
    # the PFB perf frontier (round-4 measured 88.1 us = 11.9 Gsps)
    "wb64c_t512": (64, 64, 64, 512, 1_000_000.0),
    # oversampled PFB row (round-4 measured 229-336 us)
    "wb64_t512": (64, 64, 16, 512, 1_000_000.0),
}


def _lowpass(nt, cf):
    n = np.arange(nt) - (nt - 1) / 2.0
    h = np.sinc(2 * cf * n) * np.hamming(nt)
    return (h / h.sum()).astype(np.float64)


def _flagship_shifts(c):
    # __graft_entry__._model geometry: tuning 100 MHz, channels at
    # 100 MHz - 480 kHz + 60 kHz * i -> shifts +480k - 60k*i (off-grid
    # at Fs = 1 MHz: lcm denominator 1e6/gcd(60k, 1e6) -> K = 50, D=4 | 50
    # fails the P <= 4 rule, so the flagship stays dense)
    return [480_000.0 - 60_000.0 * i for i in range(c)]


def build(name, grade="bf16x3"):
    c, kg, d, t, fs = CONFIGS[name]
    if kg is None:
        shifts = _flagship_shifts(c)
        cutoff = 0.03
    else:
        bins = list(range(c))
        shifts = [b * fs / kg for b in bins]
        cutoff = 0.4 / kg
    taps = _lowpass(t, cutoff)
    gain = fm_demod_gain(fs, 75_000.0)
    b_, a_ = fm_deemphasis_coeffs(75e-6, fs / d)
    lo = phase_digit_table(shifts, fs)
    n_buf = N_SAMPLES + t - 1
    if kg is None:
        plan = fcp.fm_chain_plan(
            make_complex_tap_bank(taps, shifts, fs), d, gain, b_, a_,
            n_buf, shifts, fs, precision=grade)
    else:
        plan = fcp.pfb_fm_chain_plan(
            taps, d, gain, b_, a_, n_buf, shifts, fs, list(range(c)), kg,
            precision=grade)
    rng = np.random.default_rng(0)
    buf = ComplexArray(
        jnp.asarray(rng.standard_normal(n_buf), jnp.float32),
        jnp.asarray(rng.standard_normal(n_buf), jnp.float32))
    return plan, lo, buf, c


def make_step(plan, lo, c, ablate):
    def step(state, buf):
        f, z, s = state
        b2 = ComplexArray(buf.re + s * 1e-30, buf.im)
        audio, f2, z2 = fcp.fm_chain_apply(
            plan, b2, lo, jnp.asarray(5, jnp.int32), f, z, ablate=ablate)
        return (f2, z2, jnp.sum(audio) * 1e-9), audio

    state0 = (ComplexArray(jnp.zeros((c, 1), jnp.float32),
                           jnp.zeros((c, 1), jnp.float32)),
              jnp.zeros((c, 1), jnp.float32),
              jnp.float32(0.0))
    return step, state0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="flagship,wb64c_t512")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--grades", default="bf16x3")
    ap.add_argument("--stages", default="grid,dot,rotor,disc,full")
    args = ap.parse_args()

    # an unknown ablate value would silently run the FULL kernel under
    # the wrong label (the kernel's ablate chain has no validation)
    known = ("grid", "dot", "rotor", "disc", "full")
    bad = [s for s in args.stages.split(",") if s not in known]
    if bad:
        ap.error(f"unknown stage(s) {bad}; choose from {known}")

    steps = {}
    for name in args.configs.split(","):
        for grade in args.grades.split(","):
            plan, lo, buf, c = build(name, grade)
            print(json.dumps({
                "config": f"{name}/{grade}", "front": plan.front,
                "bn": plan.bn, "n_sub": plan.n_sub,
                "R_or_P": plan.r_stack, "grid_steps": plan.n_j // plan.bn,
                "K": (plan.groups * plan.rows if plan.front != "pfb"
                      else 2 * plan.k_grid), "Q": plan.q_fold}),
                flush=True)
            for ab in args.stages.split(","):
                steps[(name, grade, ab)] = (
                    make_step(plan, lo, c, ab), buf)

    results = {}
    for rnd in range(args.rounds):
        for key, ((step, state0), buf) in steps.items():
            try:
                sec = time_step(step, state0, buf, iters=args.iters, reps=5)
                us = sec * 1e6
                results.setdefault(key, []).append(us)
                print(json.dumps({
                    "round": rnd, "config": "/".join(key),
                    "us_per_step": round(us, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({"round": rnd, "config": "/".join(key),
                                  "error": str(e)[:200]}), flush=True)

    # stage split from the per-key minima (min = standard noisy-bench
    # practice; the tunnel band is +-10-30%)
    for name in args.configs.split(","):
        for grade in args.grades.split(","):
            mins = {}
            for ab in args.stages.split(","):
                v = results.get((name, grade, ab))
                if v:
                    mins[ab] = min(v)
            if len(mins) < 2:
                continue
            split = {"grid_dma": mins.get("grid")}
            order = [a for a in ("grid", "dot", "rotor", "disc", "full")
                     if a in mins]
            for prev, cur in zip(order, order[1:]):
                split[f"{cur}-{prev}"] = round(mins[cur] - mins[prev], 1)
            print(json.dumps({"summary": f"{name}/{grade}",
                              "min_us": {k: round(v, 1)
                                         for k, v in mins.items()},
                              "split_us": split}), flush=True)


if __name__ == "__main__":
    main()
