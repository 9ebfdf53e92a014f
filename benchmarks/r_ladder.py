"""Stacking-factor (R) ladder for the fused FM chain on the real chip.

Why re-measure: the MXU floor of the window dot scales with the Toeplitz
span K = groups * R*2D ~ (p_cnt + R - 1) * 2D — SMALLER R does fewer MXU
FLOPs (R=8: K=192 vs R=16: K=256 at T=64/D=4) at the cost of a narrower
(R*2D)-lane W build. The round-2 ladder that picked full-lane R=16
(BASELINE.md: 235/175/151/200 us at fm16 R=4/8/16/32) predates the
intra-step overlap split (n_sub): now that the VPU W-build can hide
under the dots, the balance may shift toward smaller R wherever the MXU
floor is the binding constraint — which measurement says is fm64
(bf16x3-vs-bf16x2 delta ~= one full MXU pass).

Floors at C=64, bf16x3 (2C*K*M_out*3 passes / 197 TF/s bf16):
  R=4: K=160 -> 164 us | R=8: K=192 -> 196 us | R=16: K=256 -> 262 us.

Method: plan/apply composite (prep + kernel + unstack) per (grade, R),
carries threaded as loop state plus a sum(audio) checksum folded into the
injected input so neither the kernel nor the unstack can be hoisted/DCE'd
(CLAUDE.md timing discipline). Two interleaved rounds — judge pairs, not
absolute numbers (tunnel band is +-10-30%).

Usage: python -m benchmarks.r_ladder [--c 64] [--rounds 2]
"""

import argparse
import dataclasses
import json

import numpy as np

import jax.numpy as jnp

from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.kernels import fm_chain_pallas as fcp
from gsdr_tpu.utils.timing import time_step
from __graft_entry__ import _model

N_SAMPLES = 1 << 20


def make_step(plan, model):
    lo = model._lo_table()
    b_, a_ = model._deemph()
    c = model.num_channels

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
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--grades", default="bf16x3,bf16x2")
    ap.add_argument("--rs", default="4,8,16")
    args = ap.parse_args()

    model = dataclasses.replace(
        _model(num_channels=args.c, num_taps=64, decimation=4),
        impl="pallas")
    t = model.num_taps
    n_buf = N_SAMPLES + t - 1
    rng = np.random.default_rng(0)
    buf = ComplexArray(
        jnp.asarray(rng.standard_normal(n_buf), jnp.float32),
        jnp.asarray(rng.standard_normal(n_buf), jnp.float32))

    configs = []
    for grade in args.grades.split(","):
        for r in (int(x) for x in args.rs.split(",")):
            configs.append((grade, r))

    steps = {}
    for grade, r in configs:
        plan = fcp.fm_chain_plan(
            model._tap_bank(), model.decimation, model.gain,
            *model._deemph(), n_buf, tuple(model._shifts()),
            model.sample_rate, precision=grade, r_stack=r)
        print(json.dumps({"config": f"{grade}/R{r}", "bn": plan.bn,
                          "n_sub": plan.n_sub, "K": plan.groups * plan.rows,
                          "M": plan.r_stack * 2 * plan.c_eff}), flush=True)
        steps[(grade, r)] = make_step(plan, model)

    any_ok = False
    for rnd in range(args.rounds):
        for grade, r in configs:
            step, state0 = steps[(grade, r)]
            try:
                sec = time_step(step, state0, buf, iters=args.iters, reps=5)
                print(json.dumps({
                    "round": rnd, "config": f"{grade}/R{r}",
                    "us_per_step": round(sec * 1e6, 1),
                    "msps": round(N_SAMPLES / sec / 1e6, 1)}), flush=True)
                any_ok = True
            except Exception as e:
                print(json.dumps({"round": rnd, "config": f"{grade}/R{r}",
                                  "error": str(e)[:200]}), flush=True)
    if not any_ok:
        raise SystemExit("r_ladder: every config errored")


if __name__ == "__main__":
    main()
