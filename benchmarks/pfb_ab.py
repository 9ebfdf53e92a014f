"""Dense-Toeplitz vs PFB-fronted fused FM chain A/B on the real chip.

The PFB front (round 4, kernels/fm_chain_pallas.pfb_fm_chain_plan)
replaces the Toeplitz window contraction with a Q-tap polyphase fold +
one (2C, 2K) DFT-bank dot per output phase, for channels on a uniform
Fs/K grid. MXU work per output: 4*C*K (PFB, K exact) vs ~2*(2C)*K_toe /
outputs-per-col (dense, Toeplitz zero-span) — the PFB form's advantage
scales with the prototype filter length (Q = T/K fold passes are VPU
fmas, not MXU columns), so the A/B sweeps tap counts at fixed grids:

  * fm64g_t64   C=64  K=64  D=4   T=64   (the judge's fm64 shape, on-grid)
  * wb64_t512   C=64  K=64  D=16  T=512  (realistic wideband: Q=8)
  * wb64c_t512  C=64  K=64  D=64  T=512  (critically sampled, P=1)
  * fm256g_t64  C=256 K=256 D=4   T=64   (T < K: PFB expected to LOSE —
                                          single-stage DFT does 4CK > 4CT)

Method identical to benchmarks/r_ladder.py (plan/apply composite, carries
threaded, checksum-injected input; interleaved rounds — judge pairs).

Usage: python -m benchmarks.pfb_ab [--rounds 2] [--configs all]
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
FS = 1e6

CONFIGS = {
    "fm64g_t64": (64, 64, 4, 64),
    "wb64_t512": (64, 64, 16, 512),
    "wb64c_t512": (64, 64, 64, 512),
    "fm256g_t64": (256, 256, 4, 64),
    # round-5 additions: the P=8 class the extended win rule admits, and
    # the wide critical grids (PFB measured 2.7x / 3.5x over dense)
    "wb64_d8_t512": (64, 64, 8, 512),
    "wb128c_t1024": (128, 128, 128, 1024),
    "wb256c_t2048": (256, 256, 256, 2048),
}


def _lowpass(nt, cf):
    n = np.arange(nt) - (nt - 1) / 2.0
    h = np.sinc(2 * cf * n) * np.hamming(nt)
    return (h / h.sum()).astype(np.float64)


def make_step(plan, lo, b_, a_, c):
    def step(state, buf):
        f, z, s = state
        b2 = ComplexArray(buf.re + s * 1e-30, buf.im)
        audio, f2, z2 = fcp.fm_chain_apply(
            plan, b2, lo, jnp.asarray(5, jnp.int32), f, z)
        return (f2, z2, jnp.sum(audio) * 1e-9), audio

    state0 = (ComplexArray(jnp.zeros((c, 1), jnp.float32),
                           jnp.zeros((c, 1), jnp.float32)),
              jnp.zeros((c, 1), jnp.float32),
              jnp.float32(0.0))
    return step, state0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--grades", default="bf16x3")
    ap.add_argument("--configs", default="all")
    args = ap.parse_args()

    names = list(CONFIGS) if args.configs == "all" \
        else args.configs.split(",")
    rng = np.random.default_rng(0)

    steps = {}
    for name in names:
        c, kg, d, t = CONFIGS[name]
        bins = list(range(c))
        shifts = [b * FS / kg for b in bins]
        taps = _lowpass(t, 0.4 / kg)
        gain = fm_demod_gain(FS, 75_000.0)
        # stay inside the de-emphasis bilinear validity region at large
        # D (tau > 1/(pi*audio_rate); round-5 guard) — tau does not
        # change the kernel geometry being timed
        tau = max(75e-6, 1.1 / (np.pi * FS / d))
        b_, a_ = fm_deemphasis_coeffs(tau, FS / d)
        lo = phase_digit_table(shifts, FS)
        n_buf = N_SAMPLES + t - 1
        buf = ComplexArray(
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32),
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32))
        for grade in args.grades.split(","):
            dense = fcp.fm_chain_plan(
                make_complex_tap_bank(taps, shifts, FS), d, gain, b_, a_,
                n_buf, shifts, FS, precision=grade)
            try:
                pfb = fcp.pfb_fm_chain_plan(
                    taps, d, gain, b_, a_, n_buf, shifts, FS, bins, kg,
                    precision=grade)
            except ValueError as e:
                print(json.dumps({"config": f"{name}/{grade}/pfb",
                                  "plan_rejected": str(e)[:200]}),
                      flush=True)
                pfb = None
            for label, plan in (("dense", dense), ("pfb", pfb)):
                if plan is None:
                    continue
                print(json.dumps({
                    "config": f"{name}/{grade}/{label}", "bn": plan.bn,
                    "n_sub": plan.n_sub, "R_or_P": plan.r_stack,
                    "K": (plan.groups * plan.rows if plan.front != "pfb"
                          else 2 * plan.k_grid),
                    "Q": plan.q_fold}), flush=True)
                steps[(name, grade, label)] = (
                    make_step(plan, lo, b_, a_, c), buf)

    any_ok = False
    for rnd in range(args.rounds):
        for key, ((step, state0), buf) in steps.items():
            try:
                sec = time_step(step, state0, buf, iters=args.iters, reps=5)
                print(json.dumps({
                    "round": rnd, "config": "/".join(key),
                    "us_per_step": round(sec * 1e6, 1),
                    "msps": round(N_SAMPLES / sec / 1e6, 1)}), flush=True)
                any_ok = True
            except Exception as e:
                print(json.dumps({"round": rnd, "config": "/".join(key),
                                  "error": str(e)[:200]}), flush=True)
    if not any_ok:
        raise SystemExit("pfb_ab: every config errored")


if __name__ == "__main__":
    main()
